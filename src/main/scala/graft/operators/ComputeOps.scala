package graft.operators

import graft.cube.Cube
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** User-code surfaces (SURVEY §2.10).
  *
  * `computeCube` is the reference's compute_cube / compute_dataset hook
  * (xcube/core/compute.py:28-365): a user kernel invoked once per spatial
  * BLOCK with all of the block's rows — the Spark analog of the per-chunk
  * numpy callback, expressed as groupByKey(blockKey).flatMapGroups. The
  * kernel runs on executors, one group per block; nothing is collected to
  * the driver. Kernels leave whole-stage codegen, so use them only for
  * logic Columns can't express (the reference makes the same trade: numpy
  * kernels instead of dask graph ops).
  *
  * `varsToDim` is vars_to_dim (xcube/core/vars2dim.py:10-46): reshape
  * variable COLUMNS into a (var, value) dimension — the relational form is
  * an inline array-of-struct explode, one pass, no shuffle.
  *
  * `combineCubes` is the gen2 CubesCombiner (gen2/local/combiner.py):
  * full-outer merge of cubes on the cell key with variable-column union —
  * missing cells surface as NaN.
  */
object ComputeOps {

  /** Apply `kernel` once per spatial block (cube.gm tile grid). The kernel
    * sees every row of its block and returns output rows of `outSchema`.
    */
  def computeCube(cube: Cube, outSchema: StructType)
                 (kernel: (Long, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val gm = cube.gm
    val withKey = cube.df.withColumn("__block", gm.blockKeyExpr(cube.x, cube.y))
    val keyIdx = withKey.schema.fieldIndex("__block")
    withKey.groupByKey(r => r.getLong(keyIdx))(Encoders.scalaLong)
      .flatMapGroups { (block: Long, rows: Iterator[Row]) => kernel(block, rows) }(
        Encoders.row(outSchema))
  }

  /** vars_to_dim: one output row per (cell, variable) with columns
    * (`dimName`, `valueName`) replacing the variable columns.
    */
  def varsToDim(cube: Cube, vars: Seq[String],
                dimName: String = "var", valueName: String = "value"): DataFrame = {
    val entries = array(vars.map(v =>
      struct(lit(v).as(dimName), col(v).cast("double").as(valueName))): _*)
    cube.df
      .withColumn("__e", explode(entries))
      .select(col(cube.timeCol), col(cube.yCol), col(cube.xCol),
        col(s"__e.$dimName").as(dimName), col(s"__e.$valueName").as(valueName))
  }

  /** Full-outer merge of cubes on (time, y, x) with variable union; cells
    * absent from a member keep NaN for that member's variables.
    */
  def combineCubes(cubes: Seq[Cube]): Cube = {
    require(cubes.nonEmpty)
    val keys = Seq(cubes.head.timeCol, cubes.head.yCol, cubes.head.xCol)
    val merged = cubes.map(_.df).reduce { (a, b) =>
      a.join(b, keys, "full_outer")
    }
    val varCols = merged.columns.filterNot(keys.contains)
    val filled = varCols.foldLeft(merged) { (d, v) =>
      d.withColumn(v, coalesce(col(v).cast("double"), lit(Double.NaN)))
    }
    Cube(filled, cubes.head.gm, keys(0), keys(1), keys(2))
  }
}
