package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — the Spark-native
  * incremental-state surface (§2.9) the reference's server keeps in its
  * dataset cache: a per-key running tracker that survives across
  * micro-batches.
  *
  * The tracked state is deliberately arrival-order-independent so the
  * converged result equals a batch query exactly:
  *  - counts are integers;
  *  - sums accumulate integer CENTS (the inputs are 2-decimal values), so
  *    no floating-point summation order exists;
  *  - "last" value is by (event time, event id), not by arrival.
  */
object StatefulOps {

  final case class Obs(key: Long, tsMicros: Long, value: Double, eventId: Long)

  final case class KeyState(n: Long, sumCents: Long, lastTs: Long,
                            lastVal: Double, lastId: Long)

  final case class KeySummary(key: Long, n: Long, sum_value: Double,
                              last_value: Double)

  /** Fold a (possibly streaming) Dataset of observations into per-key
    * running state; emits the updated summary for every key touched by the
    * batch (Update semantics).
    */
  def trackKeys(ds: Dataset[Obs]): Dataset[KeySummary] = {
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[KeySummary]
    ds.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[KeyState, KeySummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Obs], state: GroupState[KeyState]) =>
          var st = state.getOption.getOrElse(
            KeyState(0L, 0L, Long.MinValue, Double.NaN, Long.MinValue))
          rows.foreach { o =>
            val newer = o.tsMicros > st.lastTs ||
              (o.tsMicros == st.lastTs && o.eventId > st.lastId)
            st = KeyState(
              st.n + 1,
              st.sumCents + math.round(o.value * 100),
              if (newer) o.tsMicros else st.lastTs,
              if (newer) o.value else st.lastVal,
              if (newer) o.eventId else st.lastId)
          }
          state.update(st)
          Iterator(KeySummary(key, st.n, st.sumCents / 100.0, st.lastVal))
      }
  }
}
