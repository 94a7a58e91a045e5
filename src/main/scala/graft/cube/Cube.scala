package graft.cube

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A data cube in long/tall relational form: one row per cell,
  * `(time, y, x, var1, var2, ...)`, plus the GridMapping sidecar.
  *
  * Spark-first re-expression of the reference's cube contract
  * (xcube/core/verify.py:34-75, normalize.py:143-233): instead of enforcing
  * dimension order on N-D arrays, the relational cube enforces the presence
  * and types of the key columns; everything else is a data variable.
  *
  * At 100 TB the physical layout is Parquet partitioned by
  * (date(time), spatial block); all subsetting operators compile to
  * partition-pruned scans.
  */
final case class Cube(
    df: DataFrame,
    gm: GridMapping,
    timeCol: String = "time",
    yCol: String = "y",
    xCol: String = "x") {

  def spark: SparkSession = df.sparkSession

  /** Data variable columns = everything that isn't a key column or a
    * coordinate-bounds column (`<coord>_lower`/`<coord>_upper`, the §1.2
    * relational encoding of the reference's bounds arrays).
    */
  def varNames: Seq[String] = {
    val bounds = Seq(timeCol, yCol, xCol)
      .flatMap(c => Seq(s"${c}_lower", s"${c}_upper")).toSet
    df.columns.filterNot(c =>
      c == timeCol || c == yCol || c == xCol || bounds.contains(c)).toSeq
  }

  def time: Column = col(timeCol)
  def y: Column = col(yCol)
  def x: Column = col(xCol)

  def withDf(f: DataFrame => DataFrame): Cube = copy(df = f(df))

  /** Validity report, mirroring verify_cube (verify.py:34-238): empty = OK. */
  def verify(): Seq[String] = {
    val issues = scala.collection.mutable.ListBuffer.empty[String]
    val sch = df.schema
    def fieldType(n: String): Option[DataType] =
      sch.fields.find(_.name == n).map(_.dataType)
    fieldType(timeCol) match {
      case None => issues += s"missing time column '$timeCol'"
      case Some(t) if !t.isInstanceOf[TimestampType] =>
        issues += s"time column '$timeCol' is $t, expected timestamp"
      case _ =>
    }
    Seq(yCol, xCol).foreach { c =>
      fieldType(c) match {
        case None => issues += s"missing coordinate column '$c'"
        case Some(DoubleType) | Some(FloatType) =>
        case Some(t) => issues += s"coordinate column '$c' is $t, expected double"
      }
    }
    if (varNames.isEmpty) issues += "cube has no data variables"
    varNames.foreach { v =>
      fieldType(v) match {
        case Some(_: NumericType) | Some(BooleanType) =>
        case Some(t) => issues += s"variable '$v' has non-numeric type $t"
        case None =>
      }
    }
    issues.toSeq
  }

  /** CubeSchema analog (schema.py:14-201). */
  def cubeSchema: CubeSchema =
    CubeSchema(timeCol, yCol, xCol, varNames, gm.width, gm.height)
}

/** Inferred shape metadata — reference CubeSchema (schema.py:14-201). */
final case class CubeSchema(
    timeName: String,
    yName: String,
    xName: String,
    varNames: Seq[String],
    width: Long,
    height: Long) {
  def dims: Seq[String] = Seq(timeName, yName, xName)
}

object Cube {
  /** Decode a plain DataFrame into a cube with a KNOWN resolution — a single
    * min/max aggregation pass, no distinct-count expand. This is the hot-path
    * decode for a 100 TB cube whose res is recorded in table metadata; the
    * grid size falls out of `(max - min) / res`.
    */
  def fromDataFrame(df: DataFrame, xRes: Double, yRes: Double,
                    timeCol: String, yCol: String, xCol: String): Cube = {
    val (xmin, xmax, ymin, ymax) = coordExtent(df, yCol, xCol)
    val nx = math.max(1L, math.round((xmax - xmin) / xRes) + 1)
    val ny = math.max(1L, math.round((ymax - ymin) / yRes) + 1)
    val gm = GridMapping(nx, ny, xmin - xRes / 2, ymin - yRes / 2, xRes, yRes)
    Cube(df, gm, timeCol, yCol, xCol)
  }

  /** Decode with full inference (resolution from distinct coordinate count)
    * — the relational analog of decode_cube + GridMapping.from_dataset
    * (normalize.py:143, gridmapping/base.py:808).
    *
    * NOTE: this runs an EAGER aggregation over the coordinate columns,
    * including two countDistincts (expand + shuffle). Fine for test fixtures
    * and small cubes; at scale prefer `Cube(df, gm)` with a recorded
    * GridMapping or the known-resolution overload above.
    */
  def fromDataFrame(df: DataFrame, timeCol: String = "time",
                    yCol: String = "y", xCol: String = "x"): Cube = {
    // guard rail: nothing stops a caller pointing this at a 100 TB table,
    // where the two countDistincts below are an expensive full-expand
    // aggregation — surface it instead of silently eating the cluster
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      "Cube.fromDataFrame(df) runs an EAGER coordinate aggregation with two " +
        "countDistincts to infer the grid; on large tables prefer " +
        "Cube(df, gm) with a recorded GridMapping or the known-resolution " +
        "fromDataFrame(df, xRes, yRes, ...) overload")
    // cast to double so FloatType coords (accepted by verify) don't make
    // the min/max aggregates FloatType and break getDouble
    val row = df.agg(
      min(col(xCol).cast("double")).as("xmin"), max(col(xCol).cast("double")).as("xmax"),
      min(col(yCol).cast("double")).as("ymin"), max(col(yCol).cast("double")).as("ymax"),
      countDistinct(col(xCol)).as("nx"), countDistinct(col(yCol)).as("ny")
    ).head()
    val (xmin, xmax) = (row.getDouble(0), row.getDouble(1))
    val (ymin, ymax) = (row.getDouble(2), row.getDouble(3))
    val (nx, ny) = (row.getLong(4), row.getLong(5))
    val xRes = if (nx > 1) (xmax - xmin) / (nx - 1) else 1.0
    val yRes = if (ny > 1) (ymax - ymin) / (ny - 1) else 1.0
    // coords are cell centers: bbox extends half a cell beyond min/max
    val gm = GridMapping(nx, ny, xmin - xRes / 2, ymin - yRes / 2, xRes, yRes)
    Cube(df, gm, timeCol, yCol, xCol)
  }

  private def coordExtent(df: DataFrame, yCol: String, xCol: String): (Double, Double, Double, Double) = {
    val row = df.agg(
      min(col(xCol).cast("double")), max(col(xCol).cast("double")),
      min(col(yCol).cast("double")), max(col(yCol).cast("double"))).head()
    (row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3))
  }
}
