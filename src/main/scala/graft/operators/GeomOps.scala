package graft.operators

import graft.cube.Cube
import graft.functions.GeomFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geometry masking and rasterization — re-expression of
  * xcube/core/geom.py on the long-format cube.
  */
object GeomOps {

  /** mask_dataset_by_geometry (geom.py:284-423): NaN-out variable values at
    * cells outside the geometry; optionally clip rows to the geometry bbox.
    * The bbox pre-filter is codegen'd and prunable; the exact predicate
    * (JTS prepared geometry) only runs on bbox survivors.
    */
  def maskByGeometry(cube: Cube, wkt: String, clip: Boolean = false,
                     saveMask: Option[String] = None): Cube = {
    val inG = GeomFunctions.geomMask(wkt)(cube.x, cube.y)
    var df = cube.df
    // NaN is the missing-value marker for float variables only (the
    // reference casts int vars to float when masking; we leave non-numeric
    // columns such as labels untouched).
    val numeric = cube.varNames.filter { v =>
      df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    if (clip) {
      // The reference clips to the JOINT envelope of the geometry
      // (geom.py:445-529 — one bbox), so between-island cells of a
      // multi-part geometry SURVIVE the clip (masked to NaN below).
      // When every variable is numeric and no mask column is requested,
      // those survivors are indistinguishable from dropped rows to the
      // skipna aggregations clip exists to accelerate — so the row
      // filter tightens to the per-PART envelope union (consumed
      // same-dim Or intervals + the exact Or-of-boxes residual, see
      // clipToFeatureBboxes) and a two-island MultiPolygon time series
      // prunes the chunks between the islands. With saveMask set or
      // non-numeric (unmaskable) variables present, rows between the
      // part envelopes are OBSERVABLE (mask=false rows, label rows), so
      // only the reference's joint envelope may drop rows — the per-dim
      // interval filters below still prune chunks outside it.
      val envs = GeomFunctions.wktPartBboxes(wkt)
      df =
        if (saveMask.isEmpty && numeric.lengthCompare(cube.varNames.length) == 0)
          bboxUnionClip(cube, envs)(df)
        else {
          val x1 = envs.map(_._1).min; val y1 = envs.map(_._2).min
          val x2 = envs.map(_._3).max; val y2 = envs.map(_._4).max
          df.filter(cube.x.between(x1, x2) && cube.y.between(y1, y2))
        }
    }
    df = df.withColumn("__in_geom", inG)
    for (v <- numeric)
      df = df.withColumn(v,
        when(col("__in_geom"), col(v).cast("double")).otherwise(lit(Double.NaN)))
    saveMask.foreach(m => df = df.withColumn(m, col("__in_geom")))
    cube.copy(df = df.drop("__in_geom"))
  }

  /** clip_dataset_by_geometry (geom.py:445-529): drop rows outside the
    * geometry's bbox — pure prunable filter.
    */
  def clipByGeometry(cube: Cube, wkt: String): Cube = {
    val (x1, y1, x2, y2) = GeomFunctions.wktBbox(wkt)
    cube.withDf(_.filter(cube.x.between(x1, x2) && cube.y.between(y1, y2)))
  }

  /** Multi-feature bbox clip in the CONNECTOR-CONSUMABLE shape — the
    * pruning half of zonal statistics over a feature layer (reference
    * geom.py:51-281): rows outside every feature envelope are dropped.
    *
    * Filter order is the whole design. The per-dim UNIONS of the feature
    * envelopes go first — each is an Or of ranges on ONE column, which
    * the DSv2 scans consume into per-dim interval sets
    * (ZarrScan.rectFull ivUnion) and prune chunks with, so the chunks
    * BETWEEN features are never read in either pruned dim. The exact
    * Or-of-rectangles then runs as a residual codegen filter on the
    * survivors: a cross-column Or cannot become per-dim intervals
    * without admitting the unions' cross product (a chunk at feature
    * A's x-range and feature B's y-range survives pruning), so the
    * residual restores row-exactness above the scan. At a 10^7-chunk
    * archive the scan plans O(union-covered chunks), not O(chunks). */
  def clipToFeatureBboxes(cube: Cube, wkts: Seq[String]): Cube = {
    require(wkts.nonEmpty, "clipToFeatureBboxes needs at least one feature")
    cube.withDf(bboxUnionClip(cube, wkts.flatMap(
      GeomFunctions.wktPartBboxes)))
  }

  /** The union-then-residual filter chain over a set of envelopes:
    * consumed per-dim interval unions first, exact Or-of-boxes after. */
  private def bboxUnionClip(cube: Cube,
                            envs: Seq[(Double, Double, Double, Double)])
      : DataFrame => DataFrame = { df =>
    val xU = envs.map { case (x1, _, x2, _) => cube.x.between(x1, x2) }
      .reduce(_ || _)
    val yU = envs.map { case (_, y1, _, y2) => cube.y.between(y1, y2) }
      .reduce(_ || _)
    val boxes = envs.map { case (x1, y1, x2, y2) =>
      cube.x.between(x1, x2) && cube.y.between(y1, y2)
    }.reduce(_ || _)
    df.filter(xU).filter(yU).filter(boxes)
  }

  /** rasterize_features (geom.py:51-281): burn feature properties into the
    * cube, last-feature-wins on overlap (geom.py:262-280).
    *
    * The feature list is driver-resident vector data (the reference takes an
    * in-memory GeoDataFrame), so the burn compiles to a SINGLE projection:
    * per property, a coalesce over per-feature `when(covers, value)`
    * branches evaluated in REVERSE feature order — the first match is the
    * last feature. The cube side never shuffles, never expands rows, and
    * each feature's bbox pre-filter is codegen'd before its UDF predicate.
    * Cells covered by no feature get NaN.
    *
    * Above `ExprFormMaxFeatures` features the op switches to
    * `rasterizeFeaturesJoin` automatically (broadcast join + one
    * partial-aggregated shuffle) instead of growing an arbitrarily wide
    * expression tree — callers get the scale-safe plan without having to
    * know the threshold.
    */
  def rasterizeFeatures(cube: Cube, features: DataFrame, geomCol: String,
                        props: Seq[String]): Cube = {
    val rows = features.select((geomCol +: props).map(col): _*)
      .limit(ExprFormMaxFeatures + 1).collect()
    if (rows.length > ExprFormMaxFeatures)
      return rasterizeFeaturesJoin(cube, features, geomCol, props)
    val df = props.zipWithIndex.foldLeft(cube.df) { case (d, (p, pi)) =>
      val branches = rows.reverseIterator.map { r =>
        val wkt = r.getString(0)
        val v = r.get(pi + 1) match {
          case null => Double.NaN
          case n: Number => n.doubleValue()
        }
        when(GeomFunctions.geomMask(wkt)(cube.x, cube.y), lit(v))
      }.toSeq
      d.withColumn(p, coalesce(branches :+ lit(Double.NaN): _*))
    }
    cube.copy(df = df)
  }

  /** Feature-count ceiling for the expression-tree burn; larger layers take
    * the join form. ~100 coalesce branches × bbox+predicate stays well
    * inside codegen limits; beyond that the expression tree both bloats the
    * plan and loses whole-stage codegen (64 KB method limit).
    */
  val ExprFormMaxFeatures: Int = 100

  /** Join-based rasterization for LARGE feature sets, bucketed on a bbox
    * grid: every feature explodes into the `bucketSize`-wide grid cells
    * its envelope overlaps (via the codegen'd [[GeomFunctions.wktBboxCol]]),
    * cells key into the same grid, and the broadcast join is an EQUI-join
    * on the bucket id with the exact containment predicate as a residual —
    * each cell only tests the features whose bbox shares its bucket,
    * never the whole layer (a cells × features nested loop would become
    * the bottleneck the moment the layer grows: 10^9 cells × 10^5 features
    * is 10^14 predicate evaluations; bucketed, each cell pays for its
    * local features only). Last-feature-wins via a map-side-combined
    * max_by, as before.
    *
    * Pick `bucketSize` near the typical feature bbox extent — replication
    * is extent/bucketSize + 1 per axis per feature, and bucket population
    * bounds the per-cell exact tests (the [[graft.operators.JoinOps.rangeJoin]]
    * guidance in 2-D).
    */
  def rasterizeFeaturesJoin(cube: Cube, features: DataFrame, geomCol: String,
                            props: Seq[String],
                            bucketSize: Double = 32.0): Cube = {
    require(bucketSize > 0, s"bucketSize $bucketSize")
    val feat = features.withColumn("__fidx", monotonically_increasing_id())
      .withColumn("__bb", GeomFunctions.wktBboxCol(col(geomCol)))
      .withColumn("__fcx", explode(sequence(
        floor(col("__bb")(0) / bucketSize).cast("long"),
        floor(col("__bb")(2) / bucketSize).cast("long"))))
      .withColumn("__fcy", explode(sequence(
        floor(col("__bb")(1) / bucketSize).cast("long"),
        floor(col("__bb")(3) / bucketSize).cast("long"))))
      .drop("__bb")
    val withCells = cube.df
      .withColumn("__cx", floor(cube.x / bucketSize).cast("long"))
      .withColumn("__cy", floor(cube.y / bucketSize).cast("long"))
    val joined = withCells.join(
      broadcast(feat),
      col("__cx") === col("__fcx") && col("__cy") === col("__fcy") &&
        GeomFunctions.inGeomCol(col(geomCol), cube.x, cube.y),
      "left_outer")
    val keys = cube.df.columns.map(col).toSeq
    val best = joined.groupBy(keys: _*).agg(
      max_by(struct(props.map(p => col(p).cast("double").as(p)): _*),
        col("__fidx")).as("__best"))
    val propCols = props.map(p =>
      coalesce(col(s"__best.$p"), lit(Double.NaN)).as(p))
    cube.copy(df = best.select(keys ++ propCols: _*))
  }
}
