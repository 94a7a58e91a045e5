package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join with PARAMETERIZED lateness bound — the
  * §2.9 surface batch engines fake with range joins. Views pair with the
  * clicks that follow them within `interval`; both sides carry the same
  * watermark so Spark bounds the buffered state:
  *
  *  - a view is held in state only until the watermark passes
  *    `v_ts + interval` (no later click can match it);
  *  - a click arriving more than `watermark` behind the observed max event
  *    time is DROPPED on arrival — the late-data contract.
  *
  * `watermark` is the operator's single tuning knob at scale: it trades
  * completeness under disorder against state size. The replay query
  * (`q_stream_join`) passes a bound wider than the fixture's disorder so
  * one AvailableNow pass equals the batch interval join exactly; the
  * multi-batch unit spec drives a tight bound and asserts both the drop
  * and the state eviction.
  *
  * Column contract: views (v_user, v_id, v_ts), clicks (c_user, c_id,
  * c_ts); output is the joined rows (append mode downstream).
  */
object StreamJoinOps {

  def viewClickIntervalJoin(views: DataFrame, clicks: DataFrame,
                            watermark: String,
                            interval: String = "30 MINUTES"): DataFrame =
    views.withWatermark("v_ts", watermark)
      .join(clicks.withWatermark("c_ts", watermark),
        col("v_user") === col("c_user") &&
          col("c_ts") > col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr(s"INTERVAL $interval"))
}
