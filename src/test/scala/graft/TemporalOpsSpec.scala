package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class TemporalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketStart: fixed freqs are epoch-anchored, calendar freqs truncate") {
    import spark.implicits._
    val df = Seq(ts("2024-01-05 13:00:00"), ts("2024-02-17 00:30:00")).toDF("t")
    val got = df.select(
      TemporalOps.bucketStart(col("t"), "8D").as("d8"),
      TemporalOps.bucketStart(col("t"), "12H").as("h12"),
      TemporalOps.bucketStart(col("t"), "1M").as("m1")).collect()
    // 8-day epoch anchor: floor(19727/8)*8 = 19720 days = 2023-12-29
    assert(got(0).getTimestamp(0) == ts("2023-12-29 00:00:00"))
    assert(got(0).getTimestamp(1) == ts("2024-01-05 12:00:00"))
    assert(got(0).getTimestamp(2) == ts("2024-01-01 00:00:00"))
    assert(got(1).getTimestamp(2) == ts("2024-02-01 00:00:00"))
    intercept[IllegalArgumentException] {
      TemporalOps.bucketStart(col("t"), "3M")
    }
  }

  test("resampleInTime: full method set incl. NaN skipping and arg tiebreak") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 01:00:00"), 1.0),
      (ts("2024-01-01 02:00:00"), 5.0),
      (ts("2024-01-01 03:00:00"), Double.NaN),
      (ts("2024-01-01 04:00:00"), 5.0), // ties max with 02:00 → later wins
      (ts("2024-01-02 01:00:00"), 2.0)
    ).toDF("time", "v")
    val out = TemporalOps.resampleInTime(df, "time", "1D",
      Seq("v" -> "mean", "v" -> "median", "v" -> "count", "v" -> "first",
          "v" -> "last", "v" -> "argmax", "v" -> "std", "v" -> "sum"))
      .orderBy("t").collect()
    val day1 = out(0)
    assert(day1.getAs[Double]("v_mean") == (1.0 + 5.0 + 5.0) / 3) // NaN skipped
    assert(day1.getAs[Double]("v_median") == 5.0)
    assert(day1.getAs[Long]("v_count") == 3L)
    assert(day1.getAs[Double]("v_first") == 1.0)
    assert(day1.getAs[Double]("v_last") == 5.0)
    assert(day1.getAs[Timestamp]("v_argmax") == ts("2024-01-01 04:00:00"))
    assert(day1.getAs[Double]("v_sum") == 11.0)
    assert(out(1).getAs[Double]("v_mean") == 2.0)
  }

  test("ffill/bfill/interpolate over a sparse series") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), Some(10.0)),
      (1, ts("2024-01-02 00:00:00"), None),
      (1, ts("2024-01-03 00:00:00"), None),
      (1, ts("2024-01-04 00:00:00"), Some(40.0)),
      (1, ts("2024-01-05 00:00:00"), None)
    ).toDF("k", "time", "v")
    val f = TemporalOps.ffill(df, Seq("k"), "time", "v", "vf")
    val b = TemporalOps.bfill(f, Seq("k"), "time", "v", "vb")
    val i = TemporalOps.interpolate(b, Seq("k"), "time", "v", "vi",
      t => unix_timestamp(t).cast("double"))
    val rows = i.orderBy("time").collect()
    assert(rows.map(_.getAs[Double]("vf")).toSeq == Seq(10.0, 10.0, 10.0, 40.0, 40.0))
    assert(rows(1).getAs[Double]("vb") == 40.0)
    assert(rows(4).isNullAt(rows(4).fieldIndex("vb"))) // nothing after
    assert(rows(1).getAs[Double]("vi") == 20.0) // 1/3 of the way 10→40
    assert(rows(2).getAs[Double]("vi") == 30.0)
    assert(rows(4).getAs[Double]("vi") == 40.0) // endpoint falls back
  }

  test("nearestFill picks the closer neighbour, respects tolerance, ties->prev") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), Some(10.0)),
      (1, ts("2024-01-02 00:00:00"), None),   // dp=1 dn=2 -> prev
      (1, ts("2024-01-03 00:00:00"), None),   // dp=2 dn=1 -> next
      (1, ts("2024-01-04 00:00:00"), Some(40.0)),
      (1, ts("2024-01-05 00:00:00"), None),   // dp=1 -> prev
      (1, ts("2024-01-09 00:00:00"), None)    // dp=5 > tol -> null
    ).toDF("k", "time", "v")
    val out = TemporalOps.nearestFill(df, Seq("k"), "time", "v", "vn",
      t => unix_timestamp(t).cast("double") / 86400.0, tolerance = Some(2.0))
      .orderBy("time").collect()
    assert(out(1).getDouble(3) == 10.0)
    assert(out(2).getDouble(3) == 40.0)
    assert(out(4).getDouble(3) == 40.0)
    assert(out(5).isNullAt(3))
    // equidistant tie prefers the previous value
    val tie = Seq((1, ts("2024-01-01 00:00:00"), Some(1.0)),
                  (1, ts("2024-01-02 00:00:00"), None),
                  (1, ts("2024-01-03 00:00:00"), Some(3.0))).toDF("k", "time", "v")
    val mid = TemporalOps.nearestFill(tie, Seq("k"), "time", "v", "vn",
      t => unix_timestamp(t).cast("double") / 86400.0)
      .orderBy("time").collect()(1)
    assert(mid.getDouble(3) == 1.0)
  }
}
