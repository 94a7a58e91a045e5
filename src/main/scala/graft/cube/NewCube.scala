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

  /** Variables are expressions over (timeIdx, jIdx, iIdx, time, y, x). */
  def apply(
      spark: SparkSession,
      gm: GridMapping = GridMapping.global1deg,
      timePeriods: Int = 5,
      timeStart: String = "2010-01-01",
      timeFreqDays: Int = 1,
      variables: Map[String, Column] = Map("precipitation" -> lit(0.6),
                                           "temperature" -> lit(276.2)),
      timeCol: String = "time", yCol: String = "y", xCol: String = "x"): Cube = {

    val times = spark.range(timePeriods).select(
      col("id").as("time_idx"),
      // bin-center label like new.py:155-157: start + (k + 0.5) * freq
      timestamp_seconds(
        unix_timestamp(lit(timeStart).cast("timestamp")) +
          (col("id").cast("double") + 0.5) * lit(timeFreqDays * 86400.0)
      ).as(timeCol))
    val ys = spark.range(gm.height).select(
      col("id").as("j_idx"), gm.yExpr(col("id")).as(yCol))
    val xs = spark.range(gm.width).select(
      col("id").as("i_idx"), gm.xExpr(col("id")).as(xCol))

    var df = times.crossJoin(ys).crossJoin(xs)
    variables.foreach { case (name, expr0) => df = df.withColumn(name, expr0) }
    Cube(df.drop("time_idx", "j_idx", "i_idx"), gm, timeCol, yCol, xCol)
  }
}
