package graft.cube

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic cube generator — the key test fixture, mirroring the
  * reference's `new_cube` (xcube/core/new.py:13-268): a regular global grid
  * with daily time steps and constant / function-of-index variables.
  *
  * Built from `spark.range` cross joins so it scales to arbitrarily large
  * fixtures without driver memory: the cross join of three ranges is a
  * nested-loop over broadcast ranges, fully parallel.
  */
object NewCube {

  /** Variables are expressions over (timeIdx, jIdx, iIdx, time, y, x).
    * With `withBounds` the fixture also carries the reference's bounds
    * arrays (new.py:163-205) as `time_lower/time_upper` and
    * `y_lower/y_upper`, `x_lower/x_upper` columns (§1.2 bounds mapping).
    */
  def apply(
      spark: SparkSession,
      gm: GridMapping = GridMapping.global1deg,
      timePeriods: Int = 5,
      timeStart: String = "2010-01-01",
      timeFreqDays: Int = 1,
      variables: Map[String, Column] = Map("precipitation" -> lit(0.6),
                                           "temperature" -> lit(276.2)),
      timeCol: String = "time", yCol: String = "y", xCol: String = "x",
      withBounds: Boolean = false): Cube = {

    val t0 = unix_timestamp(lit(timeStart).cast("timestamp"))
    val freqSec = lit(timeFreqDays * 86400.0)
    val times = spark.range(timePeriods).select(
      col("id").as("time_idx"),
      // bin-center label like new.py:155-157: start + (k + 0.5) * freq
      timestamp_seconds(t0 + (col("id").cast("double") + 0.5) * freqSec).as(timeCol))
    val ys = spark.range(gm.height).select(
      col("id").as("j_idx"), gm.yExpr(col("id")).as(yCol))
    val xs = spark.range(gm.width).select(
      col("id").as("i_idx"), gm.xExpr(col("id")).as(xCol))

    var df = times.crossJoin(ys).crossJoin(xs)
    if (withBounds) {
      df = df
        .withColumn(s"${timeCol}_lower",
          timestamp_seconds(t0 + col("time_idx").cast("double") * freqSec))
        .withColumn(s"${timeCol}_upper",
          timestamp_seconds(t0 + (col("time_idx").cast("double") + 1) * freqSec))
        .withColumn(s"${yCol}_lower", col(yCol) - gm.yRes / 2)
        .withColumn(s"${yCol}_upper", col(yCol) + gm.yRes / 2)
        .withColumn(s"${xCol}_lower", col(xCol) - gm.xRes / 2)
        .withColumn(s"${xCol}_upper", col(xCol) + gm.xRes / 2)
    }
    variables.foreach { case (name, expr0) => df = df.withColumn(name, expr0) }
    Cube(df.drop("time_idx", "j_idx", "i_idx"), gm, timeCol, yCol, xCol)
  }
}
