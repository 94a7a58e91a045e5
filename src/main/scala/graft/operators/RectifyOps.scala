package graft.operators

import graft.cube.GridMapping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** rectify_dataset (reference resampling/rectify.py:23-852): map source rows
  * carrying IRREGULAR 2-D coordinates (satellite swath, reprojected grids)
  * onto a regular target grid.
  *
  * The reference inverts the coordinate arrays per destination pixel with a
  * numba triangle-containment kernel. The relational re-expression runs
  * forward instead: every source row already knows its containing target
  * cell (floor arithmetic, codegen'd); per target cell the source sample
  * nearest the cell center wins, with a deterministic tiebreak. ONE shuffle
  * on the compact (i, j) key, map-side combined by min_by — no kernels, no
  * driver participation, and the swath never cross-joins the grid.
  */
object RectifyOps {

  /** Nearest-source rectification. `src` rows carry irregular coords
    * (`xcCol`, `ycCol`); rows outside the target grid are dropped; per
    * target cell the row minimizing squared center distance (then
    * `tiebreak`) provides the variable values. Returns one row per
    * populated cell: (i, j, vars...).
    */
  def rectifyNearest(src: DataFrame, xcCol: String, ycCol: String,
                     gm: GridMapping, vars: Seq[String],
                     tiebreak: String): DataFrame = {
    val xc = col(xcCol)
    val yc = col(ycCol)
    val inRange = xc >= gm.xMin && xc < gm.xMax && yc >= gm.yMin && yc < gm.yMax
    val i = gm.iExpr(xc)
    val j = gm.jExpr(yc)
    val dx = xc - gm.xExpr(i)
    val dy = yc - gm.yExpr(j)
    val dist2 = dx * dx + dy * dy
    val keyed = src.filter(inRange)
      .withColumn("__i", i).withColumn("__j", j)
      .withColumn("__d2", dist2)
    val ord = struct(col("__d2"), col(tiebreak))
    val aggs = vars.map(v => min_by(col(v), ord).as(v))
    keyed.groupBy(col("__i").as("i"), col("__j").as("j"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Interpolating rectification (the reference's bilinear/triangular modes,
    * rectify.py interpolation kernels) as inverse-distance weighting: every
    * source sample contributes to the 3×3 block of target cells around it
    * with weight 1/(d² + eps); per cell the weighted mean of contributing
    * samples. A 9× row expansion then ONE map-side-combined shuffle on
    * (i, j) — still no per-pixel kernel and no cross join.
    */
  def rectifyIdw(src: DataFrame, xcCol: String, ycCol: String,
                 gm: GridMapping, vars: Seq[String]): DataFrame = {
    val xc = col(xcCol)
    val yc = col(ycCol)
    val expanded = src
      .withColumn("__di", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dj", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__i", gm.iExpr(xc) + col("__di"))
      .withColumn("__j", gm.jExpr(yc) + col("__dj"))
      .filter(col("__i") >= 0 && col("__i") < gm.width &&
              col("__j") >= 0 && col("__j") < gm.height)
    val dx = xc - gm.xExpr(col("__i"))
    val dy = yc - gm.yExpr(col("__j"))
    val w = lit(1.0) / (dx * dx + dy * dy + lit(1e-9))
    val weighted = expanded.withColumn("__w", w)
    val aggs = vars.map(v =>
      (sum(col("__w") * col(v).cast("double")) / sum(col("__w"))).as(v))
    weighted.groupBy(col("__i").as("i"), col("__j").as("j"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
