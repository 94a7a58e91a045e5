package graft.cube

import graft.operators.SpatialOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `GridMapping.transform` (reference base.py:714-749, transform.py:41-
  * 120): re-express a grid mapping in another CRS by projecting every
  * pixel center, yielding the (generally irregular) transformed
  * coordinate field plus the covering regular grid derived from it.
  *
  * Spark-first: the reference materializes a dask `xy_coords` array and
  * hands it to `new_grid_mapping_from_coords`; here the coordinate
  * field IS a distributed frame `(i, j, x, y)` built from
  * `spark.range` — O(pixels) work, nothing pixel-count-sized on the
  * driver — and the covering grid derives either from a caller-given
  * `xyRes` (transform.py:76-87's fast route: one bbox aggregate + the
  * j-axis direction probe, skipping "time-consuming spatial resolution
  * estimation") or through [[CfGridMapping.fromCoords2d]]'s full
  * distributed area-based estimate (the no-`xy_res` route).
  */
object GmTransform {

  /** A transformed mapping: the distributed pixel-center coordinate
    * field in the target CRS (columns i, j, x, y — the reference's
    * `xy_coords`, kept columnar) and the covering REGULAR grid (what
    * `to_regular` of the reference's irregular result produces). The
    * coords frame feeds rectification directly as an IrregularSource. */
  final case class Transformed(coords: DataFrame, gm: GridMapping)

  /** Pixel centers of `gm` as a distributed (i, j, x, y) frame. */
  def centers(spark: SparkSession, gm: GridMapping): DataFrame = {
    val w = gm.width
    spark.range(gm.width * gm.height).select(
      (col("id") % w).as("i"),
      (col("id") / w).cast("long").as("j"),
      gm.xExpr(col("id") % w).as("x"),
      gm.yExpr((col("id") / w).cast("long")).as("y"))
  }

  /** Transform `src` into `crsTo`. Same-CRS requests return the source
    * mapping unchanged with its own centers (transform.py:56-60's
    * no-op route). `xyRes` (target-CRS units) skips the distributed
    * resolution estimate, like the reference's `xy_res` argument. */
  def transform(spark: SparkSession, src: GridMapping, crsTo: String,
                xyRes: Option[Double] = None): Transformed = {
    if (SpatialOps.sameCrs(src.crs, crsTo))
      return Transformed(centers(spark, src), src)
    val base = centers(spark, src)
    val (tx, ty) = SpatialOps.transformXY(src.crs, crsTo,
      col("x"), col("y"))
    val coords = base.select(col("i"), col("j"),
      tx.cast("double").as("x"), ty.cast("double").as("y"))
    val gm = xyRes match {
      case Some(res) =>
        require(res > 0.0, s"xyRes must be positive, got $res")
        // one aggregate: true bbox + the j-axis direction probe. The
        // probe is the SIGN OF cov(j, y) over valid cells — unlike a
        // first-row/last-row mean pair it cannot go null when an edge
        // row transforms entirely off-domain (NaN), e.g. the limb rows
        // of a geostationary target
        val e = coords
          .filter(!isnan(col("x")) && !isnan(col("y")))
          .agg(min("x"), max("x"), min("y"), max("y"),
            covar_samp(col("j").cast("double"), col("y"))).head()
        require(!e.isNullAt(0), "transform: no finite transformed cells")
        val xMin = e.getDouble(0) - res / 2
        val yMin = e.getDouble(2) - res / 2
        val width = math.max(2L,
          math.round((e.getDouble(1) + res / 2 - xMin) / res))
        val height = math.max(2L,
          math.round((e.getDouble(3) + res / 2 - yMin) / res))
        GridMapping(width, height, xMin, yMin, res, res, crsTo,
          yDown = !e.isNullAt(4) && e.getDouble(4) < 0.0)
      case None =>
        CfGridMapping.fromCoords2d(coords, "i", "j", "x", "y", crsTo)
    }
    Transformed(coords, gm)
  }

  /** Transform + resample in one step: project the source cells'
    * centers and rectify `vars` onto the transformed covering grid —
    * the "compose a reprojection with a derived grid" use the reference
    * reaches via `transform().to_regular()` + `resample_in_space`. */
  def transformAndResample(cells: DataFrame, src: GridMapping,
                           crsTo: String, vars: Seq[String],
                           xyRes: Option[Double] = None): DataFrame = {
    val spark = cells.sparkSession
    val t = transform(spark, src, crsTo, xyRes)
    if (SpatialOps.sameCrs(src.crs, crsTo))
      return cells.select((col("i") +: col("j") +: vars.map(col)): _*)
    // the IrregularSource resolution must be the SOURCE pixel pitch in
    // the target CRS — it drives resampleInSpace's rectify-vs-downscale
    // route (passing the target res would pin the scale ratio at 1 and
    // make the downscale-aggregate route unreachable for fine sources).
    // The covering grid's extent over the source dimensions is that
    // pitch to within a cell either way.
    val resX = t.gm.width * t.gm.xRes / src.width
    val resY = t.gm.height * t.gm.yRes / src.height
    SpatialOps.resampleInSpace(
      SpatialOps.IrregularSource(
        cells.join(t.coords, Seq("i", "j"))
          .select((col("x") +: col("y") +: vars.map(col)): _*),
        "x", "y", resX, resY, crsTo),
      t.gm, vars)
  }
}
