package graft.operators

import graft.cube.Cube
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subsetting operators — re-expression of xcube/core/select.py.
  *
  * All of these compile to plain Catalyst select/filter/semi-join, so column
  * pruning, predicate pushdown and partition pruning apply automatically —
  * the properties the reference implements by hand-ordering ops
  * (select.py:55-62) fall out of the declarative plan.
  */
object SelectOps {

  /** select_variables_subset (select.py:66-84): keep named variables. */
  def selectVars(cube: Cube, vars: Seq[String]): Cube =
    cube.withDf(_.select((Seq(cube.timeCol, cube.yCol, cube.xCol) ++ vars).map(col): _*))

  /** drop_vars (select.py:81-84 complement). */
  def dropVars(cube: Cube, vars: Seq[String]): Cube =
    cube.withDf(_.drop(vars: _*))

  /** select_spatial_subset in world coords (select.py:87-163): bbox filter,
    * inclusive like xarray slicing of cell centers. Inverted-y grids need no
    * special casing in long form (y is data, not an axis order).
    */
  def spatialSubset(cube: Cube, x1: Double, y1: Double, x2: Double, y2: Double): Cube =
    cube.withDf(_.filter(
      cube.x.between(math.min(x1, x2), math.max(x1, x2)) &&
      cube.y.between(math.min(y1, y2), math.max(y1, y2))))

  /** select_spatial_subset in pixel coords (ij_bbox, select.py:100-120),
    * ±border, clipped by the grid mapping.
    */
  def spatialSubsetIj(cube: Cube, i0: Long, j0: Long, i1: Long, j1: Long,
                      border: Long = 0): Cube = {
    val gm = cube.gm
    val iC = gm.iExpr(cube.x)
    val jC = gm.jExpr(cube.y)
    cube.withDf(_.filter(
      iC.between(math.max(0L, i0 - border), math.min(gm.width - 1, i1 + border)) &&
      jC.between(math.max(0L, j0 - border), math.min(gm.height - 1, j1 + border))))
  }

  /** select_temporal_subset (select.py:166-213): [t1, t2 + 1 day) — the end
    * date is rounded up one day (select.py:197-204).
    */
  def temporalSubset(cube: Cube, t1: String, t2: String): Cube =
    cube.withDf(_.filter(
      cube.time >= lit(t1).cast("timestamp") &&
      cube.time < lit(t2).cast("timestamp") + expr("INTERVAL 1 DAY")))

  /** select_subset composition (select.py:26-63): vars → bbox → time. */
  def selectSubset(cube: Cube,
                   vars: Option[Seq[String]] = None,
                   bbox: Option[(Double, Double, Double, Double)] = None,
                   timeRange: Option[(String, String)] = None): Cube = {
    var c = cube
    vars.foreach(v => c = selectVars(c, v))
    bbox.foreach { case (x1, y1, x2, y2) => c = spatialSubset(c, x1, y1, x2, y2) }
    timeRange.foreach { case (t1, t2) => c = temporalSubset(c, t1, t2) }
    c
  }

  /** select_label_subset (select.py:221-347): keep only the labels of a
    * grouping column whose group passes a predicate-aggregate (e.g. ≥50%
    * valid pixels per time slice). The per-label aggregate is tiny (one row
    * per label) → broadcast left-semi join back, no second shuffle of the
    * fact side at scale.
    */
  def labelSubset(df: DataFrame, labelCol: String, groupPredicate: Column): DataFrame = {
    val good = df.groupBy(labelCol).agg(groupPredicate.as("__keep"))
      .filter(col("__keep")).select(labelCol)
    df.join(broadcast(good), Seq(labelCol), "left_semi")
  }

  /** xarray-style `.sel(dim=target, method="nearest")` along an extra
    * NON-SPATIAL dim (depth, wavelength — reference 1.13.3 #1213,
    * `get_non_spatial_labels` in xcube/core/tile.py): pick the label
    * nearest `target` (ties → the smaller label) and filter to it. The
    * distinct label set is dimension-sized — a driver-scale coordinate
    * array, like the reference's index lookup — so the equality filter
    * stays a pushed-down scan predicate.
    */
  def nearestDimLabel(df: DataFrame, dimCol: String, target: Double): (Double, DataFrame) = {
    val labels = df.select(col(dimCol).cast("double")).distinct()
      .collect().map(_.getDouble(0))
    require(labels.nonEmpty, s"nearestDimLabel: no labels in '$dimCol'")
    val chosen = labels.minBy(l => (math.abs(l - target), l))
    (chosen, df.filter(col(dimCol) === chosen))
  }
}
