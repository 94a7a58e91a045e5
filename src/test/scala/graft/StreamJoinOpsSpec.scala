package graft

import graft.streaming.StreamJoinOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamJoinOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tight watermark drops late clicks and evicts expired view state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val viewsIn = MemoryStream[(Long, Long, Timestamp)]
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val views = viewsIn.toDF().toDF("v_user", "v_id", "v_ts")
    val clicks = clicksIn.toDF().toDF("c_user", "c_id", "c_ts")
    val joined = StreamJoinOps.viewClickIntervalJoin(
      views, clicks, watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_late")
      .outputMode("append").start()
    try {
      // batch 1: one in-window pair for u1; a far-ahead click (02:00)
      // pushes max event time, so the watermark after this batch is 01:50
      viewsIn.addData((1L, 10L, ts("2024-01-01 00:00:00")))
      clicksIn.addData(
        (1L, 20L, ts("2024-01-01 00:05:00")),
        (99L, 21L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // batch 2: fresh view+click near the watermark — the join stays
      // live, and processing this batch runs the state cleanup that
      // evicts the u1 view (watermark 01:50 > v_ts + 30min = 00:30)
      viewsIn.addData((2L, 11L, ts("2024-01-01 02:01:00")))
      clicksIn.addData((2L, 23L, ts("2024-01-01 02:10:00")))
      q.processAllAvailable()
      // batch 3: a click for u1 at 00:06 — inside the 30-min window of
      // the (now-evicted) u1 view and far behind the watermark → no pair.
      // (Watermark semantics are a LOWER bound: the drop is guaranteed
      // once the state holding the view is gone, i.e. from the batch
      // after the eviction — which is exactly this batch.)
      clicksIn.addData((1L, 22L, ts("2024-01-01 00:06:00")))
      q.processAllAvailable()
      val pairs = spark.table("sj_late")
        .select(col("v_id"), col("c_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((10L, 20L)), pairs.toString) // batch-1 pair
      assert(pairs.contains((11L, 23L)), pairs.toString) // live after batch 2
      assert(!pairs.contains((10L, 22L)),
        s"late click beyond the watermark joined anyway: $pairs")
      // state is bounded by the watermark: the u1 view (00:00) expired at
      // watermark 01:50 > 00:30 = v_ts + interval, so state holds only the
      // recent rows — not everything ever ingested
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      assert(state.head.numRowsTotal <= 4,
        s"state grew unbounded: ${state.head.numRowsTotal} rows")
    } finally q.stop()
  }

  test("wide watermark keeps disordered-but-in-window clicks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val viewsIn = MemoryStream[(Long, Long, Timestamp)]
    val clicksIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamJoinOps.viewClickIntervalJoin(
      viewsIn.toDF().toDF("v_user", "v_id", "v_ts"),
      clicksIn.toDF().toDF("c_user", "c_id", "c_ts"),
      watermark = "2 hours")
    val q = joined.writeStream.format("memory").queryName("sj_wide")
      .outputMode("append").start()
    try {
      viewsIn.addData((1L, 10L, ts("2024-01-01 00:00:00")))
      clicksIn.addData((99L, 21L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // the same 00:06 click, now within the 2-hour lateness bound → kept
      clicksIn.addData((1L, 22L, ts("2024-01-01 00:06:00")))
      q.processAllAvailable()
      val pairs = spark.table("sj_wide")
        .select(col("v_id"), col("c_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((10L, 22L)), pairs.toString)
    } finally q.stop()
  }
}
