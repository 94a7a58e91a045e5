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

  // ---------------------------------------------- streaming sessionization

  final case class SessEvent(userId: Long, tsMicros: Long, eventId: Long)

  /** Closed-session totals plus the still-open session's (start, last, n). */
  final case class SessState(closedSessions: Long, closedEvents: Long,
                             maxClosedEvents: Long, sumClosedMicros: Long,
                             curStart: Long, curLast: Long, curN: Long)

  final case class SessSummary(user_id: Long, n_sessions: Long, n_events: Long,
                               max_session_events: Long, sum_session_micros: Long)

  /** Incremental gaps-and-islands sessionization — the streaming form of
    * [[graft.operators.EventOps.sessionize]]: per user,
    * `flatMapGroupsWithState` carries the closed-session totals plus the
    * open session; a gap > `gapSec` closes it. Emits the user's running
    * summary (open session included) after every batch — for monotone
    * event-time arrivals the converged output equals the batch operator
    * row-for-row. State per user is O(1); rows fold in (ts, event_id)
    * order within each micro-batch, matching the batch window's ordering.
    */
  def streamingSessionize(ds: Dataset[SessEvent],
                          gapSec: Long): Dataset[SessSummary] = {
    val gapUs = gapSec * 1000000L
    implicit val stateEnc = Encoders.product[SessState]
    implicit val outEnc = Encoders.product[SessSummary]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessState, SessSummary](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          var st = state.getOption.getOrElse(
            SessState(0L, 0L, 0L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
            st =
              if (st.curN == 0L)
                st.copy(curStart = r.tsMicros, curLast = r.tsMicros, curN = 1L)
              else if (r.tsMicros - st.curLast > gapUs)
                SessState(st.closedSessions + 1, st.closedEvents + st.curN,
                  math.max(st.maxClosedEvents, st.curN),
                  st.sumClosedMicros + (st.curLast - st.curStart),
                  r.tsMicros, r.tsMicros, 1L)
              else st.copy(curLast = r.tsMicros, curN = st.curN + 1)
          }
          state.update(st)
          if (st.curN == 0L && st.closedSessions == 0L) Iterator.empty
          else Iterator(SessSummary(key,
            st.closedSessions + (if (st.curN > 0) 1L else 0L),
            st.closedEvents + st.curN,
            math.max(st.maxClosedEvents, st.curN),
            st.sumClosedMicros +
              (if (st.curN > 0) st.curLast - st.curStart else 0L)))
      }
  }

  // ---------------------------------------------- streaming retention

  final case class RetEvent(userId: Long, bucket: Long)

  /** Cohort bucket + per-offset event counts for one user. For monotone
    * arrivals the cohort (min bucket) is fixed by the user's first event;
    * the offsets map stays bounded by the observation span in buckets.
    */
  final case class RetState(cohort: Long, counts: Map[Long, Long])

  final case class RetUser(user_id: Long, cohort_bk: Long, offset: Long,
                           n_events: Long)

  /** Incremental cohort retention — the streaming form of
    * [[graft.operators.EventOps.retention]]: per user the state is the
    * cohort bucket and the event count per offset. Emits the user's FULL
    * current (offset → count) rows each batch the user is touched
    * (Update semantics — the final emission per key is the converged
    * value; aggregate with max(n_events) per (user, cohort, offset) when
    * reading an append-style sink).
    */
  def streamingRetention(ds: Dataset[RetEvent]): Dataset[RetUser] = {
    implicit val stateEnc = Encoders.product[RetState]
    implicit val outEnc = Encoders.product[RetUser]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[RetState, RetUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[RetEvent], state: GroupState[RetState]) =>
          val hadState = state.exists
          var st = state.getOption.getOrElse(RetState(Long.MaxValue, Map.empty))
          rows.foreach { r =>
            // Counts are keyed by ABSOLUTE bucket, so WITHIN a batch any
            // arrival order is fine (emission happens after the fold). But
            // once a cohort has been EMITTED (a previous batch), a smaller
            // bucket would retro-shift it: the already-sunk rows keyed by
            // the old cohort would sit next to re-emissions under the new
            // one, and the documented max-per-key absorption would count
            // the user in BOTH cohorts. That is a violation of the
            // monotone-cohort arrival discipline — fail loudly instead of
            // double-counting silently.
            require(!(hadState && r.bucket < st.cohort),
              s"streamingRetention: user $key event in bucket ${r.bucket} " +
                s"arrived after cohort ${st.cohort} was already emitted — " +
                "cohort-defining events must arrive before later buckets " +
                "(replay per-user history in bucket order, or widen the " +
                "batch that carries the user's first events)")
            st = RetState(math.min(st.cohort, r.bucket),
              st.counts.updated(r.bucket, st.counts.getOrElse(r.bucket, 0L) + 1L))
          }
          state.update(st)
          st.counts.iterator.map { case (bk, n) =>
            RetUser(key, st.cohort, bk - st.cohort, n)
          }
      }
  }

  // ---------------------------------------------- streaming transitions

  final case class TransEvent(userId: Long, eventType: String,
                              tsMicros: Long, eventId: Long)

  /** Last event type seen + per-(prev,next) pair counts for one user.
    * Counts are keyed by a typed (prev, next) PAIR — not a joined string,
    * which needed an in-band delimiter (event types are free text, and a
    * NUL delimiter also made this file binary to grep/ripgrep). */
  final case class TransState(lastType: String, lastTs: Long, lastId: Long,
                              counts: Seq[((String, String), Long)])

  final case class TransUser(user_id: Long, prev_type: String,
                             next_type: String, n: Long)

  /** Incremental Markov transition counts — the streaming form of
    * q_event_transitions: per user the state is the last event (type +
    * ordering key) plus the (prev→next) counters, bounded by the
    * event-type alphabet squared. Rows fold in (ts, event_id) order;
    * each batch emits the user's FULL current counter rows (Update
    * semantics — aggregate with max(n) per key over an append sink).
    */
  def streamingTransitions(ds: Dataset[TransEvent]): Dataset[TransUser] = {
    implicit val stateEnc = Encoders.product[TransState]
    implicit val outEnc = Encoders.product[TransUser]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[TransState, TransUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[TransEvent], state: GroupState[TransState]) =>
          var st = state.getOption.getOrElse(
            TransState("", Long.MinValue, Long.MinValue, Seq.empty))
          var counts = st.counts.toMap
          rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
            if (st.lastType.nonEmpty) {
              val k = (st.lastType, r.eventType)
              counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
            }
            st = st.copy(lastType = r.eventType, lastTs = r.tsMicros,
              lastId = r.eventId)
          }
          st = st.copy(counts = counts.toSeq.sortBy(_._1))
          state.update(st)
          counts.iterator.map { case ((p, nx), n) =>
            TransUser(key, p, nx, n)
          }
      }
  }

  // ---------------------------------------------- streaming funnel

  final case class FunnelEvent(userId: Long, eventType: String,
                               tsMicros: Long, eventId: Long)

  /** Conversion time per stage reached so far (times.length = stage). */
  final case class FunnelState(times: Seq[Long])

  final case class FunnelUser(user_id: Long, times: Seq[Long])

  /** Incremental strict-order funnel — the streaming form of
    * [[graft.operators.EventOps.funnel]]: per user the state is the
    * conversion timestamp of each stage reached (≤ stages.length longs).
    * A forward fold in (ts, event_id) order computes exactly the batch
    * chain of "min ts strictly after the previous conversion": the first
    * qualifying event of the next needed stage IS that min for monotone
    * event-time arrivals. Emits the user's reached-stage times after every
    * batch touching them (Update semantics).
    */
  def streamingFunnel(ds: Dataset[FunnelEvent],
                      stages: Seq[String]): Dataset[FunnelUser] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelUser]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var times = state.getOption.map(_.times).getOrElse(Seq.empty)
          rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
            val k = times.length
            if (k < stages.length && r.eventType == stages(k) &&
              (k == 0 || r.tsMicros > times.last))
              times = times :+ r.tsMicros
          }
          state.update(FunnelState(times))
          if (times.isEmpty) Iterator.empty
          else Iterator(FunnelUser(key, times))
      }
  }

  // ---------------------------------------------- streaming inter-arrival

  final case class GapEvent(userId: Long, eventType: String,
                            tsMicros: Long, eventId: Long)

  /** Last event + per-type gap accumulators (n, sum, min, max) keyed by
    * the LATER event's type — alphabet-bounded state per user. */
  final case class GapState(lastTs: Long, lastId: Long,
                            acc: Map[String, (Long, Long, Long, Long)])

  final case class GapUser(user_id: Long, event_type: String, n_gaps: Long,
                           sum_gap_micros: Long, min_gap: Long, max_gap: Long)

  /** Incremental inter-arrival statistics — the streaming form of
    * q_interarrival: O(|event types|) state per user; a forward fold in
    * (ts, event_id) order accumulates exact microsecond gaps, matching
    * the batch lag window for monotone arrivals.
    */
  def streamingInterarrival(ds: Dataset[GapEvent]): Dataset[GapUser] = {
    implicit val stateEnc = Encoders.product[GapState]
    implicit val outEnc = Encoders.product[GapUser]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[GapState, GapUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[GapEvent], state: GroupState[GapState]) =>
          var st = state.getOption.getOrElse(
            GapState(Long.MinValue, Long.MinValue, Map.empty))
          rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
            if (st.lastTs != Long.MinValue) {
              val g = r.tsMicros - st.lastTs
              val (n, s0, mn, mx) = st.acc.getOrElse(r.eventType,
                (0L, 0L, Long.MaxValue, Long.MinValue))
              st = st.copy(acc = st.acc.updated(r.eventType,
                (n + 1, s0 + g, math.min(mn, g), math.max(mx, g))))
            }
            st = st.copy(lastTs = r.tsMicros, lastId = r.eventId)
          }
          state.update(st)
          st.acc.iterator.map { case (t, (n, s0, mn, mx)) =>
            GapUser(key, t, n, s0, mn, mx)
          }
      }
  }

  // ---------------------------------------------- streaming attribution

  final case class AttrEvent(userId: Long, eventType: String,
                             tsMicros: Long, eventId: Long)

  /** Last view (ts, id) + purchase attribution totals for one user. */
  final case class AttrState(lastViewTs: Long, lastViewId: Long,
                             nPurchases: Long, nAttributed: Long,
                             sumLag: Long, viewIdSum: Long)

  final case class AttrUser(user_id: Long, n_purchases: Long,
                            n_attributed: Long, sum_lag_micros: Long,
                            view_id_checksum: Long)

  /** Incremental last-touch attribution — the streaming form of
    * q_attribution: per user, O(1) state (the most recent view + running
    * attribution totals); a purchase within `lookbackSec` of that view is
    * credited to it. Rows fold in (ts, event_id) order; monotone arrivals
    * make the fold equal the batch window pass exactly.
    */
  def streamingAttribution(ds: Dataset[AttrEvent],
                           lookbackSec: Long): Dataset[AttrUser] = {
    val lookUs = lookbackSec * 1000000L
    implicit val stateEnc = Encoders.product[AttrState]
    implicit val outEnc = Encoders.product[AttrUser]
    ds.groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[AttrState, AttrUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          var st = state.getOption.getOrElse(
            AttrState(Long.MinValue, Long.MinValue, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
            if (r.eventType == "view")
              st = st.copy(lastViewTs = r.tsMicros, lastViewId = r.eventId)
            else if (r.eventType == "purchase") {
              val hit = st.lastViewTs != Long.MinValue &&
                r.tsMicros - st.lastViewTs <= lookUs
              st = st.copy(
                nPurchases = st.nPurchases + 1,
                nAttributed = st.nAttributed + (if (hit) 1L else 0L),
                sumLag = st.sumLag +
                  (if (hit) r.tsMicros - st.lastViewTs else 0L),
                viewIdSum = st.viewIdSum + (if (hit) st.lastViewId else 0L))
            }
          }
          state.update(st)
          if (st.nPurchases == 0L) Iterator.empty
          else Iterator(AttrUser(key, st.nPurchases, st.nAttributed,
            st.sumLag, st.viewIdSum))
      }
  }

  // ---------------------------------------------- streaming near-dup dedup

  /** One (doc, LSH band) row: `bandKey` is the banded-signature bucket
    * (same construction as [[graft.operators.TextOps.lshBandRows]]), `sig`
    * the doc's full minhash signature.
    */
  final case class BandRow(docId: Long, bandKey: String, sig: Seq[Long])

  /** Canonical first-seen members of one band bucket (capped). */
  final case class BucketState(members: Seq[(Long, Seq[Long])])

  final case class DupHit(doc_id: Long, matched_doc: Long,
                          est_jaccard: Double, band_key: String)

  /** Streaming MinHash near-duplicate detection — the incremental form of
    * the batch LSH pipeline: per band bucket, `flatMapGroupsWithState`
    * keeps the first-seen signatures (bounded by `maxBucket`, the same cap
    * discipline as the batch `candidatePairs`); an arriving doc whose
    * best signature-estimated Jaccard within the bucket reaches
    * `threshold` is emitted as a duplicate hit and NOT added to the state
    * (canonical firsts stay). State per bucket is O(maxBucket · perms) —
    * watermark-free by design, matching the batch semantics of "ever seen".
    *
    * Deterministic: rows fold in docId order within each micro-batch and
    * the best match ties to the lower member id — replaying the stream in
    * different batch splits yields the same hit set for monotone arrivals.
    */
  def streamingNearDup(ds: Dataset[BandRow], threshold: Double,
                       maxBucket: Int): Dataset[DupHit] = {
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[DupHit]
    ds.groupByKey(_.bandKey)(Encoders.STRING)
      .flatMapGroupsWithState[BucketState, DupHit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          var members = state.getOption.map(_.members).getOrElse(Seq.empty)
          val out = Seq.newBuilder[DupHit]
          rows.toSeq.sortBy(_.docId).foreach { r =>
            if (!members.exists(_._1 == r.docId)) {
              val best = members.iterator.map { case (id, s) =>
                val m = s.zip(r.sig).count { case (a, b) => a == b }
                (id, m.toDouble / math.max(1, r.sig.length))
              }.foldLeft(Option.empty[(Long, Double)]) {
                case (acc, cand) => acc match {
                  case Some(a) if a._2 > cand._2 ||
                    (a._2 == cand._2 && a._1 < cand._1) => acc
                  case _ => Some(cand)
                }
              }
              best match {
                case Some((id, est)) if est >= threshold =>
                  out += DupHit(r.docId, id, est, key)
                case _ =>
                  if (members.size < maxBucket)
                    members = members :+ (r.docId -> r.sig)
              }
            }
          }
          state.update(BucketState(members))
          out.result().iterator
      }
  }
}
