package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}
import org.locationtech.jts.io.WKTReader

/** Point-in-geometry predicate for cell-center masking — the Spark analog of
  * the reference's rasterio-based geometry masks (xcube/core/geom.py:284-423
  * mask_dataset_by_geometry, geom.py:51-281 rasterize_features).
  *
  * The geometry is parsed once on the driver, shipped as WKT, and prepared
  * lazily per executor (PreparedGeometry is not serializable; preparation
  * builds an edge index that makes repeated covers() checks O(log n) — this
  * matters when testing 10^9 cells against a 10^5-vertex coastline).
  */
final class GeomPredicate(val wkt: String) extends Serializable {
  @transient private lazy val prepared: PreparedGeometry =
    PreparedGeometryFactory.prepare(new WKTReader().read(wkt))
  @transient private lazy val gf = new GeometryFactory()
  /** covers = contains + boundary (cell centers exactly on an edge count). */
  def covers(x: Double, y: Double): Boolean =
    prepared.covers(gf.createPoint(new Coordinate(x, y)))
}

object GeomFunctions {

  /** Boolean Column: is the point (x, y) covered by the WKT geometry.
    * Backed by the codegen'd `PointCoveredBy` Catalyst expression — stays
    * inside WholeStageCodegen, unlike a ScalaUDF.
    */
  def inGeom(wkt: String)(x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PointCoveredBy(
      ColumnBridge.expression(x.cast("double")),
      ColumnBridge.expression(y.cast("double")), wkt))
  }

  /** Driver-side envelope of a WKT geometry → (xMin, yMin, xMax, yMax);
    * used for the cheap bbox pre-filter before the exact predicate
    * (clip_dataset_by_geometry, geom.py:445-529) so partition pruning and
    * parquet min/max skipping fire before any UDF runs.
    */
  def wktBbox(wkt: String): (Double, Double, Double, Double) = {
    val env = new WKTReader().read(wkt).getEnvelopeInternal
    (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
  }

  /** Per-PART envelopes of a WKT geometry — one per member of a
    * MultiPolygon/GeometryCollection, one total for simple geometries.
    * Feeds the Or-of-rectangles clip (GeomOps.clipToFeatureBboxes
    * shape): a two-island MultiPolygon prunes the chunks BETWEEN the
    * islands instead of scanning its whole joint envelope. */
  def wktPartBboxes(wkt: String): Seq[(Double, Double, Double, Double)] = {
    val g = new WKTReader().read(wkt)
    (0 until g.getNumGeometries).map { i =>
      val env = g.getGeometryN(i).getEnvelopeInternal
      (env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
    }
  }

  /** Geometry mask = bbox pre-filter (prunable, codegen) AND exact
    * point-in-polygon (UDF on the small survivor set).
    */
  def geomMask(wkt: String)(x: Column, y: Column): Column = {
    val (x1, y1, x2, y2) = wktBbox(wkt)
    x.between(x1, x2) && y.between(y1, y2) && inGeom(wkt)(x, y)
  }

  /** Boolean Column where the geometry itself is a column (one WKT per
    * feature row) — used as a broadcast-join condition. Backed by the
    * codegen'd [[PointCoveredByCol]] expression (per-executor prepared
    * cache keyed by the WKT text), not a ScalaUDF.
    */
  def inGeomCol(wkt: Column, x: Column, y: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(PointCoveredByCol(
      ColumnBridge.expression(wkt),
      ColumnBridge.expression(x.cast("double")),
      ColumnBridge.expression(y.cast("double"))))
  }

  /** `array(xMin, yMin, xMax, yMax)` Column for a per-row WKT column —
    * the executor-side [[wktBbox]], backed by the codegen'd
    * [[WktBboxCol]] expression with a per-executor envelope cache.
    */
  def wktBboxCol(wkt: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(WktBboxCol(ColumnBridge.expression(wkt)))
  }

  /** Normalize a geometry spec — reference normalize_geometry
    * (geom.py:559-638): bbox (x1,y1,x2,y2) → POLYGON WKT; a bbox crossing
    * the anti-meridian (x1 > x2) splits into two (geom.py:720-738).
    */
  def bboxToWkts(x1: Double, y1: Double, x2: Double, y2: Double): Seq[String] = {
    def poly(a: Double, b: Double, c: Double, d: Double) =
      s"POLYGON (($a $b, $c $b, $c $d, $a $d, $a $b))"
    if (x1 > x2) Seq(poly(x1, y1, 180.0, y2), poly(-180.0, y1, x2, y2))
    else Seq(poly(x1, y1, x2, y2))
  }

  /** normalize_geometry over every input form the reference accepts
    * (geom.py:559-638): WKT string (validated), GeoJSON geometry string,
    * (x, y) point, or bbox 4-tuple (possibly anti-meridian-split). Returns
    * WKT geometries ready for the predicate/mask operators.
    */
  def normalizeGeometry(spec: Any): Seq[String] = spec match {
    case s: String if s.trim.startsWith("{") =>
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
      Seq(graft.sources.GeoJsonSource.geometryToWkt(node))
    case s: String =>
      Seq(new WKTReader().read(s).toText) // parse → canonical WKT, rejects junk
    case (x: Double, y: Double) => Seq(s"POINT ($x $y)")
    case (x1: Double, y1: Double, x2: Double, y2: Double) =>
      bboxToWkts(x1, y1, x2, y2)
    case other =>
      throw new IllegalArgumentException(s"cannot normalize geometry from: $other")
  }

  /** Coordinate monotonicity normalization (normalize.py:45-88): a 0..360
    * longitude column → ±180. (Decreasing-latitude reversal is moot in long
    * form — y is data, not an axis order.)
    */
  def normalizeLon360(lon: Column): Column =
    when(lon > 180.0, lon - 360.0).otherwise(lon)
}
