package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral-analytics operators over an event log: conversion funnels,
  * cohort retention and sessionization (gaps-and-islands) — the standard
  * product-analytics query shapes a general analytics engine is expected to
  * answer over the same fact tables it curates.
  *
  * Scale design:
  *  - every stage is keyed on `user_id` (or a (user, session) refinement of
  *    it) — at 100 TB the user key space is huge and uniform, so each
  *    groupBy/window is an even shuffle with map-side combine where the agg
  *    allows; nothing ever sorts or collects globally.
  *  - funnel stages are sequential by definition (stage N's timestamp bounds
  *    stage N+1's search window) — expressed as a chain of per-user min
  *    aggregations + equi-joins on user_id. AQE reuses the user_id exchange
  *    across the chain; there is no per-user event buffering, so a user with
  *    millions of events costs only their partial mins.
  *  - sessionization needs within-user time order: a window partitioned by
  *    user_id, never a global sort. Per-user data must fit a partition's
  *    sort spill budget — true by construction for event logs (heavy users
  *    are bounded by time × rate, and the sort spills to disk, it does not
  *    OOM).
  *  - all emitted measures are exact integers (counts and microsecond
  *    sums), so results hash-match any engine bit-for-bit.
  */
object EventOps {

  /** Strict-order conversion funnel. `stages` are event_type values; a user
    * is counted at stage i if an event of that type exists strictly after
    * their stage-(i-1) conversion time (stage 0: any event of that type).
    *
    * Returns one row per stage: (stage, event_type, n_users,
    * sum_step_micros) where sum_step_micros totals the per-user time from
    * the previous stage's conversion to this one's (0 at stage 0).
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")

    val base = events.select(col(userCol).as("u"), col(typeCol).as("et"),
      unix_micros(col(tsCol)).as("tus"))

    // stage 0: first event of the entry type per user
    var conv = base.filter(col("et") === stages.head)
      .groupBy("u").agg(min(col("tus")).as("t_conv"))
      .withColumn("step_us", lit(0L))
    var out = conv.agg(lit(1L).as("stage"), lit(stages.head).as("event_type"),
      count(lit(1)).as("n_users"), coalesce(sum(col("step_us")), lit(0L)).as("sum_step_micros"))

    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      // events of this type strictly after the user's previous conversion
      conv = base.filter(col("et") === st)
        .join(conv.select(col("u"), col("t_conv").as("t_prev")), Seq("u"))
        .filter(col("tus") > col("t_prev"))
        .groupBy("u")
        .agg(min(col("tus")).as("t_conv"), min(col("t_prev")).as("t_prev"))
        .withColumn("step_us", col("t_conv") - col("t_prev"))
        .select("u", "t_conv", "step_us")
      out = out.unionByName(
        conv.agg(lit((i + 1).toLong).as("stage"), lit(st).as("event_type"),
          count(lit(1)).as("n_users"),
          coalesce(sum(col("step_us")), lit(0L)).as("sum_step_micros")))
    }
    out
  }

  /** Cohort retention on epoch-anchored windows of `bucketSec` seconds
    * (calendar-free, engine-portable). Cohort = the bucket of a user's
    * first event; one output row per (cohort bucket, offset in buckets)
    * with the distinct-user and event counts.
    */
  def retention(events: DataFrame, bucketSec: Long = 604800L,
                userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val busec = bucketSec * 1000000L
    val bucketed = events.select(col(userCol).as("u"),
      expr(s"unix_micros(`$tsCol`) div ${busec}L").as("bk"))
    val cohorts = bucketed.groupBy("u").agg(min(col("bk")).as("cohort_bk"))
    bucketed.join(cohorts, Seq("u"))
      .groupBy(timestamp_micros(col("cohort_bk") * busec).as("cohort_start"),
        (col("bk") - col("cohort_bk")).as("offset"))
      .agg(countDistinct(col("u")).as("n_users"), count(lit(1)).as("n_events"))
  }

  /** Gaps-and-islands sessionization: within each user's time-ordered
    * event stream, a gap > `gapSec` starts a new session. Returns one row
    * per user: (user_id, n_sessions, n_events, max_session_events,
    * sum_session_micros) — sum_session_micros totals last-minus-first
    * microseconds within each session (0 for singleton sessions).
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L,
                 userCol: String = "user_id", tsCol: String = "ts",
                 idCol: String = "event_id"): DataFrame = {
    val byUser = Window.partitionBy("u").orderBy(col("tus"), col("rowkey"))
    val gapUs = gapSec * 1000000L
    events
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("tus"),
        col(idCol).as("rowkey"))
      .withColumn("newsess",
        when(col("tus") - lag(col("tus"), 1).over(byUser) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("sid", sum(col("newsess")).over(
        Window.partitionBy("u").orderBy(col("tus"), col("rowkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("u", "sid")
      .agg(count(lit(1)).as("n_ev"), (max(col("tus")) - min(col("tus"))).as("dur_us"))
      .groupBy(col("u").as("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"),
        max(col("n_ev")).as("max_session_events"),
        sum(col("dur_us")).as("sum_session_micros"))
  }
}
