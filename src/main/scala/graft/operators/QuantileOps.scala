package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles without a global sort — the two-pass
  * histogram-refinement selection that replaces `ORDER BY v` (a full
  * shuffle-sort of the table) for "give me the exact p50/p99" at 100 TB.
  *
  * Pass 1 buckets every value by its high bits (`v >> coarseShift`) through
  * one map-side-combined count aggregation; the bucket histogram is
  * DATA-INDEPENDENT in size (value-range / 2^coarseShift rows), so the
  * running-total window over it is a bounded small-table sort, not a sort
  * of the data. Pass 2 rescans only the rows of the (at most one per
  * requested p) buckets that straddle a target rank and resolves the exact
  * member value by an in-bucket value histogram — again bounded, at most
  * 2^coarseShift distinct values per hit bucket.
  *
  * Both passes are scan + map-side-combined aggregation; the windows only
  * ever see histogram rows. No driver-side collect: the whole computation
  * is one plan (the bucket histogram broadcasts into the rank probe).
  *
  * Rank convention (mirrored in the oracle): the quantile at p is the
  * 1-indexed k-th smallest with k = floor(p·(n−1)) + 1 — `quantile_disc`
  * with lower interpolation.
  */
object QuantileOps {

  /** Exact quantiles of long-valued column `valueCol` at each p in `ps`.
    * Returns one row per p: (p, rank, value). Values may be negative;
    * `coarseShift` uses a FLOOR shift (>>), so bucket order equals value
    * order for negatives too.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                     coarseShift: Int = 12): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions out of range: $ps")
    requireIntegral(df, valueCol)
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("long").as("v"))
    val buckets = vals
      .groupBy(shiftright(col("v"), coarseShift).as("b"))
      .agg(count(lit(1)).as("cnt"))
    // running total over the bounded bucket histogram (single-partition
    // window over histogram rows only — never over the data)
    val wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val cum = buckets.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(wb), lit(0L)))
    val n = vals.agg(count(lit(1)).as("n"))
    val ranks = ps.toDF("p")
      .crossJoin(broadcast(n))
      .select(col("p"),
        (floor(col("p") * (col("n") - 1)) + 1).cast("long").as("rank"))
    // locate the straddling bucket: cum_before < rank <= cum_before + cnt
    // (tiny × bounded nested-loop join — both sides are histogram-sized)
    val target = ranks.join(broadcast(cum),
      col("rank") > col("cum_before") &&
        col("rank") <= col("cum_before") + col("cnt"))
      .select(col("p"), col("rank"), col("b"), col("cum_before"))
    // pass 2: rescan only the hit buckets, count per exact value
    val inBucket = vals
      .join(broadcast(target), shiftright(col("v"), coarseShift) === col("b"))
      .groupBy("p", "rank", "cum_before", "v")
      .agg(count(lit(1)).as("vcnt"))
    val wv = Window.partitionBy("p").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    inBucket
      .withColumn("cb2",
        col("cum_before") + coalesce(sum(col("vcnt")).over(wv), lit(0L)))
      .filter(col("rank") > col("cb2") && col("rank") <= col("cb2") + col("vcnt"))
      .select(col("p"), col("rank"), col("v").as("value"))
  }

  /** GROUPED exact quantiles — the same two-pass histogram-refinement per
    * group key (one output row per (group, p)). Identical scale shape:
    * both histograms are (groups × bounded buckets), the windows partition
    * by group over histogram rows only, and pass 2 rescans only the
    * straddling (group, bucket) pairs via a broadcast equi-join. Replaces
    * per-group `percentile`/sort aggregations whose per-group sort state
    * grows with the group at 100 TB.
    */
  def exactQuantilesBy(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       ps: Seq[Double], coarseShift: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "use exactQuantiles for the ungrouped form")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions out of range: $ps")
    requireIntegral(df, valueCol)
    val spark = df.sparkSession
    import spark.implicits._
    val gs = groupCols.map(col)
    val vals = df.select(gs :+ col(valueCol).cast("long").as("v"): _*)
      .withColumn("b", shiftright(col("v"), coarseShift))
    val buckets = vals.groupBy(gs :+ col("b"): _*).agg(count(lit(1)).as("cnt"))
    val wb = Window.partitionBy(gs: _*).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = buckets.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(wb), lit(0L)))
    val n = vals.groupBy(gs: _*).agg(count(lit(1)).as("n"))
    val ranks = n.crossJoin(ps.toDF("p"))
      .select(gs :+ col("p") :+
        (floor(col("p") * (col("n") - 1)) + 1).cast("long").as("rank"): _*)
    val target = ranks.join(broadcast(cum), groupCols)
      .filter(col("rank") > col("cum_before") &&
        col("rank") <= col("cum_before") + col("cnt"))
      .select(gs :+ col("p") :+ col("rank") :+ col("b") :+ col("cum_before"): _*)
    val inBucket = vals
      .join(broadcast(target), groupCols :+ "b")
      .groupBy(gs :+ col("p") :+ col("rank") :+ col("cum_before") :+ col("v"): _*)
      .agg(count(lit(1)).as("vcnt"))
    val wv = Window.partitionBy(gs :+ col("p"): _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    inBucket
      .withColumn("cb2",
        col("cum_before") + coalesce(sum(col("vcnt")).over(wv), lit(0L)))
      .filter(col("rank") > col("cb2") && col("rank") <= col("cb2") + col("vcnt"))
      .select(gs :+ col("p") :+ col("rank") :+ col("v").as("value"): _*)
  }

  /** The bit-shift bucket forms are INTEGER selections: a fractional
    * input would silently truncate through the `cast("long")` and
    * return the quantile of the WRONG values. Reject loudly and name
    * the double-typed companions. */
  private def requireIntegral(df: DataFrame, valueCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
      case other => throw new IllegalArgumentException(
        s"exactQuantiles* select over INTEGER values; '$valueCol' is " +
          s"$other — use QuantileOps.quantileFold (global) or " +
          "TemporalOps.groupedQuantileFold (grouped) for fractional " +
          "columns, or scale-and-cast to long explicitly")
    }
  }

  // -------------------------------------------------------------------
  // Exact quantiles over a DOUBLE variable THROUGH a connector scan —
  // the last reference aggregation method without a pushed form
  // (resample_in_time median/percentile_<p>, get_time_series median:
  // the one aggregate xcube must `.load()` the whole array for,
  // reference core/timeseries.py:40-47 MUST_LOAD, resampling/
  // temporal.py:17-161).
  // -------------------------------------------------------------------

  /** Exact `percentile_cont` quantiles of a double column (NaN = missing,
    * skipped like every reference aggregation) where EVERY data pass is a
    * pushed chunk-foldable aggregate:
    *
    *  - pass 0 — guarded count/min/max: folds per chunk
    *    (ZarrVarAggScan), and over an ANALYZEd store answers from the
    *    sidecar with ZERO chunk IO;
    *  - refinement rounds — a bucket histogram `GROUP BY
    *    floor((v − lo)/w)` under a CONSUMED value-interval filter: the
    *    key folds per chunk, the interval prunes chunks (sidecar zone
    *    maps), and single-bucket chunks answer from their moments alone;
    *    each round narrows every unresolved rank to one bucket, so round
    *    k ≥ 2 rescans ONLY the chunks straddling a target bucket;
    *  - exact finish — once a rank's interval holds ≤ `maxExactRows`
    *    rows, a distinct-value histogram (the pushed raw-value key)
    *    resolves the order statistic; the collect is bounded by the
    *    interval's distinct values.
    *
    * Bucket boundaries are NOT re-derived arithmetically: the next
    * round's value interval is computed by binary search over the
    * ordered double bit space for the exact points where Spark's own
    * `floor((v − lo)/w)` changes value, so the filtered row set equals
    * the counted bucket bit-for-bit — no boundary drift, no lost or
    * double-counted rank mass.
    *
    * Interpolation follows Spark's `percentile` / DuckDB's
    * `quantile_cont`: idx = p·(n−1), result = lower + (upper − lower) ·
    * frac over the 1-indexed order statistics ⌊idx⌋+1, ⌊idx⌋+2.
    * Returns one row per p: (p, value); value is null when every cell
    * is NaN. Driver work is O(ranks × rounds) collects of ≤ `bins`
    * histogram rows — metadata-sized, never O(cells).
    */
  def quantileFold(df: DataFrame, vCol: String, ps: Seq[Double],
                   bins: Int = 1024, maxExactRows: Long = 1L << 16,
                   maxDepth: Int = 12): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions out of range: $ps")
    require(bins >= 2, s"need at least 2 refinement bins, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v0 = col(vCol).cast("double")
    val vv = when(v0 <= lit(Double.PositiveInfinity), v0)
    // pass 0: answered with ZERO Spark jobs from a fully-covering
    // INLINE sidecar when the frame is a bare connector relation
    // (ZarrScan.bareMetaOf + ChunkStats.inlineGlobal both decline in
    // every other case), else the pushed count/min/max job
    val (n, gLo, gHi) = graft.sources.zarr.ZarrScan.bareMetaOf(df)
      .flatMap(m => graft.sources.zarr.ChunkStats.inlineGlobal(m, vCol))
      .getOrElse {
        val head = quiet(df) { q => q.agg(count(vv), min(vv), max(vv)).head() }
        (head.getLong(0),
          if (head.getLong(0) == 0L) Double.NaN else head.getDouble(1),
          if (head.getLong(0) == 0L) Double.NaN else head.getDouble(2))
      }
    if (n == 0L)
      return ps.map(p => (p, Option.empty[Double])).toDF("p", "value")
    val wants = ps.map { p =>
      val idx = p * (n - 1).toDouble
      val k = math.floor(idx).toLong
      (p, k + 1, idx - k)
    }
    val ranks = wants.flatMap { case (_, r, frac) =>
      if (frac > 0.0) Seq(r, r + 1) else Seq(r)
    }.distinct.sorted
    val resolved = quiet(df) { q =>
      resolveRanks(q, v0, gLo, gHi, n, ranks, bins, maxExactRows, maxDepth)
    }
    wants.map { case (p, r, frac) =>
      val lower = resolved(r)
      val value =
        if (frac <= 0.0 || lower == resolved(r + 1)) lower
        else {
          val upper = resolved(r + 1)
          // delta form matches DuckDB's quantile_cont on finite values;
          // an INFINITE endpoint makes (upper − lower) NaN, where the
          // weighted form is still exact (−Inf·(1−f) + v·f = −Inf)
          if (java.lang.Double.isInfinite(lower) ||
            java.lang.Double.isInfinite(upper))
            lower * (1.0 - frac) + upper * frac
          else lower + (upper - lower) * frac
        }
      (p, Option(value))
    }.toDF("p", "value")
  }

  /** Run `body` with AQE off and ONE shuffle partition, restoring the
    * session values after. Every aggregate collected inside the global
    * fold is driver-bounded BY CONSTRUCTION (≤ bins + 1 histogram rows
    * per refinement, ≤ exactCap distinct values per finish — both
    * enforced with loud errors), so the post-shuffle side is one tiny
    * task no matter the input size; AQE would only split each internal
    * collect into materialize + replan jobs (measured on q_zarr_median:
    * 8 jobs → 4, the difference pure scheduler latency at ~60 ms per
    * job boundary). The map side — the pushed per-chunk fold over the
    * full scan width — is unaffected. NOT safe for the grouped fold
    * (TemporalOps), whose intermediate cardinality is group-driven.
    *
    * The pins live on a dedicated CLONED session (one per root session,
    * pinned once at creation) and `df` is rerooted onto it — the shared
    * session conf is never written, so a concurrent query on the same
    * session keeps its AQE and partition settings, and concurrent folds
    * race on nothing. */
  private def quiet[T](df: DataFrame)(body: DataFrame => T): T =
    body(org.apache.spark.sql.graft.ConfBridge.withOverrides(df, Map(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.shuffle.partitions" -> "1")))

  /** One unresolved selection task: the inclusive value interval, the
    * count of data values strictly below it, its own row count, the
    * refinement depth, and the (ascending) target ranks inside it. */
  private final case class Hunt(lo: Double, hi: Double, below: Long,
                                rows: Long, depth: Int, ranks: List[Long])

  /** What the next data pass does for one hunt. */
  private sealed trait Act
  private case object ExactA extends Act  // distinct-value finish
  private case object RefineA extends Act // bucket histogram round
  private case object BisectA extends Act // hi − lo overflows: bit split

  private def actOf(h: Hunt, bins: Int, maxExactRows: Long,
                    maxDepth: Int): Act = {
    val w = (h.hi - h.lo) / bins
    if (!java.lang.Double.isFinite(w))
      // ±huge endpoints: hi − lo overflows to +Inf. Small hunts finish
      // exactly; big ones SPLIT at the bit-space midpoint (each split
      // halves the ordered-double span, and one split of a ±overflowing
      // interval already yields finite-width halves) — never an
      // unbounded driver collect on wide-range data.
      if (h.rows <= maxExactRows) ExactA else BisectA
    else if (h.rows <= maxExactRows || h.depth >= maxDepth || w <= 0.0)
      // w == 0 with lo < hi only happens when hi − lo underflows the
      // bins division — the interval is < bins ulps wide, so the
      // distinct-value set is at most ~bins values: exact-safe.
      // depth ≥ maxDepth with rows > maxExactRows is adversarial
      // (1024-bin refinement divides mass by 2^10/round); the exact
      // finish CAPS its collect and errors loudly rather than OOM.
      ExactA
    else RefineA
  }

  /** Resolve every rank LEVEL-synchronously: all hunts of the same depth
    * share ONE Spark job per round — the union of their (disjoint)
    * interval filters is still a consumed same-column Or the scans prune
    * chunks with, and the per-hunt group keys ride a single aggregation.
    * A 99-percentile table therefore costs O(maxDepth) jobs, not
    * O(ranks × maxDepth). A level holding a single hunt keeps the plain
    * single-interval plan (no CASE key), which the connectors fold per
    * chunk. */
  private def resolveRanks(df: DataFrame, v0: Column,
                           gLo: Double, gHi: Double, n: Long,
                           ranks: Seq[Long], bins: Int,
                           maxExactRows: Long, maxDepth: Int)
      : Map[Long, Double] = {
    val out = scala.collection.mutable.Map.empty[Long, Double]
    var level = List(Hunt(gLo, gHi, 0L, n, 0, ranks.toList))
    while (level.nonEmpty) {
      val (trivial, work) = level.partition(h => h.lo == h.hi)
      trivial.foreach(h => h.ranks.foreach(out(_) = h.lo))
      level = work match {
        case Nil => Nil
        case h :: Nil =>
          actOf(h, bins, maxExactRows, maxDepth) match {
            case ExactA => exactFinish(df, v0, h, maxExactRows, out); Nil
            case RefineA =>
              val w = (h.hi - h.lo) / bins
              val hist = df.filter(v0 >= h.lo && v0 <= h.hi)
                .groupBy(floor((v0 - lit(h.lo)) / lit(w)).as("b"))
                .agg(count(lit(1)).as("c"))
                .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
              childrenOf(h, w, hist)
            case BisectA => bisect(df, v0, h)
          }
        case hs => levelJob(df, v0, hs, bins, maxExactRows, maxDepth, out)
      }
    }
    out.toMap
  }

  /** Children hunts of a refinement round's bucket histogram. */
  private def childrenOf(h: Hunt, w: Double,
                         hist: Seq[(Long, Long)]): List[Hunt] = {
    var cum = h.below
    var rs = h.ranks
    val sub = List.newBuilder[Hunt]
    for ((b, c) <- hist if rs.nonEmpty) {
      val mine = rs.takeWhile(_ <= cum + c)
      if (mine.nonEmpty) {
        rs = rs.drop(mine.length)
        val (blo, bhi) = bucketBounds(h.lo, h.hi, w, b)
        sub += Hunt(blo, bhi, cum, c, h.depth + 1, mine)
      }
      cum += c
    }
    require(rs.isEmpty, s"rank walk exhausted with ranks $rs " +
      s"unresolved in [${h.lo}, ${h.hi}] (${h.rows} rows)")
    sub.result()
  }

  /** Split an overflowing-width hunt at the ordered-double midpoint
    * (one pushed 2-bucket count). Depth does not advance: progress is
    * guaranteed by the bit span halving, and a single split of a
    * ±overflowing range already restores finite widths. */
  private def bisect(df: DataFrame, v0: Column, h: Hunt): List[Hunt] = {
    val mid = dFromOrd(dOrd(h.lo) + ((dOrd(h.hi) - dOrd(h.lo)) >>> 1))
    val r = df.filter(v0 >= h.lo && v0 <= h.hi)
      .agg(count(when(v0 <= mid, 1)).as("c0")).head()
    val c0 = r.getLong(0)
    val (loRanks, hiRanks) = h.ranks.partition(_ <= h.below + c0)
    List(
      if (loRanks.nonEmpty)
        Some(Hunt(h.lo, mid, h.below, c0, h.depth, loRanks)) else None,
      if (hiRanks.nonEmpty)
        Some(Hunt(Math.nextUp(mid), h.hi, h.below + c0, h.rows - c0,
          h.depth, hiRanks)) else None).flatten
  }

  /** Ceiling on the distinct-value rows one exact finish may collect:
    * the normal path is bounded by `maxExactRows` anyway; the
    * degenerate-width paths (maxDepth reached on adversarial
    * duplicates) hit this guard and error LOUDLY instead of pulling an
    * unbounded histogram onto the driver. */
  private def exactCap(maxExactRows: Long): Int =
    math.min((Int.MaxValue >> 1).toLong, math.max(maxExactRows, 1L << 16)).toInt

  /** Resolve a bounded task's ranks from the distinct-value histogram
    * (the pushed raw-value group key under the consumed interval). The
    * collect is a TopK (`orderBy.limit`) — per-partition bounded heaps,
    * never an unbounded driver pull. */
  private def exactFinish(df: DataFrame, v0: Column, h: Hunt,
                          maxExactRows: Long,
                          out: scala.collection.mutable.Map[Long, Double])
      : Unit = {
    val cap = exactCap(maxExactRows)
    val hist = df.filter(v0 >= h.lo && v0 <= h.hi)
      .groupBy(v0.as("v")).agg(count(lit(1)).as("c"))
      .orderBy("v").limit(cap + 1).collect()
    require(hist.length <= cap,
      s"exact quantile finish over [${h.lo}, ${h.hi}] holds more than " +
        s"$cap distinct values after refinement degenerated " +
        s"(depth ${h.depth}, ${h.rows} rows) — raise maxDepth, bins, or " +
        "maxExactRows")
    walkExact(hist.map(r => (r.getDouble(0), r.getLong(1))), h, out)
  }

  private def walkExact(hist: Seq[(Double, Long)], h: Hunt,
                        out: scala.collection.mutable.Map[Long, Double])
      : Unit = {
    var cum = h.below
    var rs = h.ranks
    val it = hist.iterator
    while (rs.nonEmpty && it.hasNext) {
      val (v, c) = it.next()
      while (rs.nonEmpty && rs.head <= cum + c) {
        out(rs.head) = v
        rs = rs.tail
      }
      cum += c
    }
    require(rs.isEmpty, s"exact finish exhausted with ranks $rs " +
      s"unresolved in [${h.lo}, ${h.hi}]")
  }

  /** One Spark job for a WHOLE level of hunts: the filter is the Or of
    * the hunts' pairwise-disjoint intervals (consumed, chunk-pruned);
    * the group key is (hunt id, per-hunt bucket, per-hunt exact value),
    * each a first-match CASE over the disjoint intervals. Output rows
    * are bounded per hunt — ≤ bins + 1 for a refinement, 2 for a
    * bisection, `exactCap` for an exact finish (enforced by a TopK
    * collect + loud error). Returns the next level. */
  private def levelJob(df: DataFrame, v0: Column, hs: List[Hunt],
                       bins: Int, maxExactRows: Long, maxDepth: Int,
                       out: scala.collection.mutable.Map[Long, Double])
      : List[Hunt] = {
    val acts = hs.map(h => actOf(h, bins, maxExactRows, maxDepth))
    val mids = hs.zip(acts).map {
      case (h, BisectA) =>
        dFromOrd(dOrd(h.lo) + ((dOrd(h.hi) - dOrd(h.lo)) >>> 1))
      case _ => 0.0
    }
    val orFilter = hs.map(h => v0 >= h.lo && v0 <= h.hi).reduce(_ || _)
    val hid = coalesce(hs.zipWithIndex.map { case (h, i) =>
      when(v0 >= h.lo && v0 <= h.hi, lit(i))
    }: _*)
    val bkt = coalesce(hs.zip(acts).zipWithIndex.map {
      case ((h, RefineA), i) =>
        when(hid === i,
          floor((v0 - lit(h.lo)) / lit((h.hi - h.lo) / bins)))
      case ((_, BisectA), i) =>
        when(hid === i, when(v0 <= mids(i), lit(0L)).otherwise(lit(1L)))
      case ((_, ExactA), i) => when(hid === i, lit(0L))
    }: _*).cast("long")
    val exIds = acts.zipWithIndex.collect { case (ExactA, i) => i }
    val vx =
      if (exIds.isEmpty) lit(0.0)
      else when(hid.isin(exIds: _*), v0).otherwise(lit(0.0))
    val cap = hs.zip(acts).map {
      case (_, RefineA) => bins.toLong + 1L
      case (_, BisectA) => 2L
      case (_, ExactA) => exactCap(maxExactRows).toLong
    }.sum.min((Int.MaxValue >> 1).toLong).toInt
    val rows = df.filter(orFilter)
      .groupBy(hid.as("h"), bkt.as("b"), vx.as("vx"))
      .agg(count(lit(1)).as("c"))
      .orderBy("h", "b", "vx").limit(cap + 1).collect()
    require(rows.length <= cap,
      s"quantile level job over ${hs.length} hunts exceeded $cap " +
        "histogram rows — raise maxDepth, bins, or maxExactRows")
    val byHunt = rows.groupBy(_.getInt(0))
    hs.zip(acts).zipWithIndex.flatMap { case ((h, act), i) =>
      val mine = byHunt.getOrElse(i, Array.empty)
      act match {
        case ExactA =>
          // the summed cap above only bounds the LEVEL; each exact hunt
          // must also honor its own budget, or one degenerate hunt
          // could ride the other hunts' slack and collect far past the
          // single-hunt exactFinish guarantee
          require(mine.length <= exactCap(maxExactRows),
            s"exact quantile finish over [${h.lo}, ${h.hi}] holds more " +
              s"than ${exactCap(maxExactRows)} distinct values after " +
              s"refinement degenerated (depth ${h.depth}, ${h.rows} " +
              "rows) — raise maxDepth, bins, or maxExactRows")
          walkExact(mine.map(r => (r.getDouble(2), r.getLong(3))).toSeq,
            h, out)
          Nil
        case RefineA =>
          childrenOf(h, (h.hi - h.lo) / bins,
            mine.map(r => (r.getLong(1), r.getLong(3))).toSeq.sortBy(_._1))
        case BisectA =>
          val c0 = mine.find(_.getLong(1) == 0L).map(_.getLong(3))
            .getOrElse(0L)
          val (loR, hiR) = h.ranks.partition(_ <= h.below + c0)
          List(
            if (loR.nonEmpty)
              Some(Hunt(h.lo, mids(i), h.below, c0, h.depth, loR)) else None,
            if (hiR.nonEmpty)
              Some(Hunt(Math.nextUp(mids(i)), h.hi, h.below + c0,
                h.rows - c0, h.depth, hiR)) else None).flatten
      }
    }
  }

  /** The EXACT inclusive value boundaries of histogram bucket `b` under
    * Spark's `floor((v − lo)/w)` — found by binary search over the
    * ordered double bit space (the key is monotone non-decreasing in v),
    * not by re-deriving `lo + b·w` arithmetically, which can misplace
    * boundary values by an ulp and desynchronize rank bookkeeping from
    * the counted buckets. ~64 key evaluations per edge, driver-side. */
  private[operators] def bucketBounds(lo: Double, hi: Double, w: Double, b: Long)
      : (Double, Double) = {
    def key(v: Double): Double = math.floor((v - lo) / w)
    val bd = b.toDouble
    val blo = if (key(lo) >= bd) lo else leastWith(lo, hi, v => key(v) >= bd)
    val bhi =
      if (key(hi) <= bd) hi
      else Math.nextDown(leastWith(blo, hi, v => key(v) > bd))
    (blo, bhi)
  }

  /** Leftmost double in [a, c] satisfying the MONOTONE predicate `pred`
    * (pred(c) must hold). Binary search over the order-preserving long
    * mapping of IEEE doubles. */
  private def leastWith(a: Double, c: Double,
                        pred: Double => Boolean): Double = {
    if (pred(a)) return a
    var lo = dOrd(a) // invariant: !pred(lo)
    var hi = dOrd(c) // invariant: pred(hi)
    // the true gap always fits UNSIGNED (it is < 2^64 and ≥ 0), so both
    // the loop test and the midpoint read (hi − lo) as unsigned — a
    // signed read can overflow when the interval spans ±huge doubles
    while (java.lang.Long.compareUnsigned(hi - lo, 1L) > 0) {
      val mid = lo + ((hi - lo) >>> 1)
      if (pred(dFromOrd(mid))) hi = mid else lo = mid
    }
    dFromOrd(hi)
  }

  /** Order-preserving double↔long bijection (negatives flip their
    * magnitude bits so bit order equals value order; −0.0 sits just
    * below +0.0, which is consistent — the two compare equal in every
    * arithmetic this search feeds). */
  private def dOrd(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    if (b >= 0) b else b ^ 0x7fffffffffffffffL
  }

  private def dFromOrd(o: Long): Double =
    java.lang.Double.longBitsToDouble(
      if (o >= 0) o else o ^ 0x7fffffffffffffffL)
}
