package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** resample_in_time — re-expression of the reference's temporal resampling
  * (xcube/core/resampling/temporal.py:17-161; method lists cli/resample.py:
  * 18-41) on the long-format cube.
  *
  * Downsampling compiles to ONE groupBy on the bucket-start expression —
  * map-side partial aggregation, a single shuffle on (bucket, keys), fully
  * codegen'd. Buckets are left-closed and left-labeled like the reference
  * (temporal.py:82-84). Fixed frequencies (nH/nD/nW) are epoch-anchored
  * arithmetic; calendar frequencies (1M/1Q/1Y) are date_trunc — a fixed
  * window would drift across month lengths.
  *
  * SCOPE: only the proleptic Gregorian calendar (Spark's TimestampType) is
  * supported. The reference's non-Gregorian cftime calendars (360_day,
  * noleap, ...; xcube timecoord.py:33-300) are out of scope for v0 —
  * convert such data to Gregorian timestamps at ingest.
  *
  * Upsampling (ffill/bfill/interpolate, temporal.py:138-161) uses a per-key
  * ordered window. At 100 TB the partitionBy keys are the spatial cell
  * (y, x) — millions of small partitions, which Spark windows handle without
  * skew; there is no global sort.
  */
object TemporalOps {

  private val FixedFreq = "([0-9]+)[ ]?([hHdDwW])".r
  private val CalFreq = "1[ ]?([mMqQyY])".r

  /** Bucket START timestamp for a frequency string ("8D", "12H", "1W",
    * "1M", "1Q", "1Y"). Left-closed, left-labeled.
    */
  def bucketStart(time: Column, freq: String): Column = freq match {
    case FixedFreq(n, u) =>
      val sec = n.toLong * (u.toUpperCase match {
        case "H" => 3600L
        case "D" => 86400L
        case "W" => 604800L
      })
      timestamp_seconds(
        floor(unix_timestamp(time).cast("double") / lit(sec)).cast("long") * lit(sec))
    case CalFreq(u) =>
      val unit = u.toUpperCase match {
        case "M" => "MONTH"
        case "Q" => "QUARTER"
        case "Y" => "YEAR"
      }
      date_trunc(unit, time)
    case other =>
      throw new IllegalArgumentException(
        s"unsupported frequency '$other' (expected nH/nD/nW or 1M/1Q/1Y)")
  }

  /** One aggregation column for a reference method name over variable `v`
    * with time column `t`. NaN is the missing-value marker: every method
    * skips NaN like the reference's skipna aggregations (temporal.py uses
    * xarray's nan-aware reducers).
    *
    * Methods: mean, median, std, var, sum, prod, count, min, max, first,
    * last, argmin, argmax, all, any, percentile_<p> (p in 0..100).
    */
  def methodAgg(method: String, v: Column, t: Column): Column = {
    // null-out NaN so builtin aggs (which skip null, not NaN) skip it.
    // The guard is `v <= +Inf`, not `!isnan(v)`: under Spark's double
    // ordering NaN is the ONE value greater than +Inf, so the two are
    // semantically identical — but `<=` translates to a DataSourceV2
    // expression (ISNAN does not), which lets the whole skipna aggregate
    // push below a connector scan and fold per chunk (ZarrVarAggScan).
    val vv = when(v.cast("double") <= lit(Double.PositiveInfinity), v)
    val validT = when(vv.isNotNull, t)
    val Percentile = "percentile_([0-9]+(?:\\.[0-9]+)?)".r
    method match {
      case "mean" => avg(vv)
      case "median" => percentile(vv, lit(0.5))
      case "std" => stddev_samp(vv)
      case "var" => var_samp(vv)
      case "sum" => sum(vv)
      case "prod" => product(vv)
      case "count" => count(vv)
      case "min" => min(vv)
      case "max" => max(vv)
      // first/last in TIME order (not partition order): min_by/max_by on the
      // time of valid rows — deterministic, unlike first()/last()
      case "first" => min_by(vv, validT)
      case "last" => max_by(vv, validT)
      // argmin/argmax return the TIME of the extremum (reference keeps the
      // coord of the winning index); ties break to the latest time via the
      // (value, time) struct ordering
      case "argmax" => max_by(t, when(vv.isNotNull, struct(vv, t)))
      case "argmin" => min_by(t, when(vv.isNotNull, struct(vv, t)))
      case "all" => bool_and(vv.cast("boolean"))
      case "any" => bool_or(vv.cast("boolean"))
      case Percentile(p) => percentile(vv, lit(p.toDouble / 100.0))
      case other => throw new IllegalArgumentException(s"unknown method '$other'")
    }
  }

  /** Downsample: group rows into freq buckets (per extra key columns, e.g.
    * the spatial cell) and compute `<var>_<method>` columns — the
    * reference's output naming (temporal.py renames `<var>_<method>`).
    */
  def resampleInTime(df: DataFrame, timeCol: String, freq: String,
                     aggs: Seq[(String, String)],
                     extraKeys: Seq[String] = Nil,
                     labelCol: String = "t"): DataFrame = {
    require(aggs.nonEmpty, "resampleInTime needs at least one (var, method)")
    val keys = bucketStart(col(timeCol), freq).as(labelCol) +: extraKeys.map(col)
    val aggCols = aggs.map { case (v, m) =>
      methodAgg(m, col(v), col(timeCol)).as(s"${v}_$m")
    }
    df.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** The connector-foldable bucket keys of a NUMERIC time axis: named
    * key columns (a single-divide floor block index for fixed widths,
    * year/month/quarter EXTRACTs for calendar frequencies — both shapes
    * [[graft.sources.zarr.ZarrVarAggScan]] folds per chunk) plus the
    * bucket-start label reconstructed from the key names ABOVE the
    * aggregate. */
  private def numericKeys(timeDim: String, unitSeconds: Double,
                          freq: String): (Seq[Column], Column) = {
    val ts = (col(timeDim) * lit(unitSeconds)).cast("timestamp")
    freq match {
      case FixedFreq(n, u) =>
        val sec = n.toLong * (u.toUpperCase match {
          case "H" => 3600L
          case "D" => 86400L
          case "W" => 604800L
        })
        (Seq(floor(col(timeDim) / lit(sec / unitSeconds)).as("__b")),
          timestamp_seconds(col("__b") * lit(sec)))
      case CalFreq(u) =>
        u.toUpperCase match {
          case "Y" => (Seq(year(ts).as("__yr")),
            make_date(col("__yr"), lit(1), lit(1)).cast("timestamp"))
          case "M" => (Seq(year(ts).as("__yr"), month(ts).as("__mo")),
            make_date(col("__yr"), col("__mo"), lit(1)).cast("timestamp"))
          case "Q" => (Seq(year(ts).as("__yr"), quarter(ts).as("__q")),
            make_date(col("__yr"), (col("__q") - 1) * 3 + 1, lit(1))
              .cast("timestamp"))
        }
      case other =>
        throw new IllegalArgumentException(
          s"unsupported frequency '$other' (expected nH/nD/nW or 1M/1Q/1Y)")
    }
  }

  /** [[resampleInTime]] over a NUMERIC time dimension — the connector
    * cubes' CF-decoded time axis (`timeDim` counts `unitSeconds`-second
    * units since the epoch, e.g. 86400 for "days since 1970-01-01").
    * Same output contract (bucket-start label + `<var>_<method>`
    * columns), but the group keys are chosen so the CONNECTORS fold them
    * per chunk (ZarrVarAggScan): calendar frequencies (1M/1Q/1Y) group
    * by the year/month/quarter EXTRACT keys of
    * `cast(timeDim * unitSeconds as timestamp)` — computable per cell
    * from the chunk's own coordinate slice — and fixed-width
    * frequencies by the single-divide floor block key
    * `floor(timeDim / (bucketSeconds/unitSeconds))`. The bucket-start
    * label is reconstructed ABOVE the aggregate from the pushed key
    * columns, so a "1M" resample over a 10^7-chunk archive exchanges
    * O(chunks × months) partial rows, never O(cells) — the
    * resampling/temporal.py shape finished in the scan.
    */
  def resampleInTimeNumeric(df: DataFrame, timeDim: String,
                            unitSeconds: Double, freq: String,
                            aggs: Seq[(String, String)],
                            extraKeys: Seq[String] = Nil,
                            labelCol: String = "t"): DataFrame = {
    require(aggs.nonEmpty,
      "resampleInTimeNumeric needs at least one (var, method)")
    // each method maps to connector-foldable aggregate PIECES plus a
    // finisher evaluated above the scan: std/var ship the moment
    // partials (count/sum/sum-of-squares — the only aggregates Spark
    // partial-pushes; one-pass moment formula, exact on dyadic gates
    // like StatsOps.statisticsFold); any/all ship min/max of the
    // guarded ABSOLUTE VALUE (truthiness of v == |v| > 0 — exact at
    // every magnitude, subnormals included); the
    // rest are methodAgg's forms, which fold where Spark translates
    // them (mean/count/min/max/sum) and stay row-path where it cannot:
    // argmax/argmin/first/last have their own two-phase folds below,
    // per-bucket exact median/percentile has [[resampleQuantileFold]]
    // and the GLOBAL form [[graft.operators.QuantileOps.quantileFold]].
    // `prod` per bucket stays row-path BY DESIGN (recorded decision):
    // the only chunk-foldable decomposition — sign/zero counts plus a
    // sum of log-magnitudes — is not exact in IEEE doubles (exp∘Σlog
    // ≠ Π), so a "pushed" prod would silently diverge from this row
    // path; and FP products are order-sensitive, so there is no
    // order-exact distributed contract to match. Revisit trigger: a
    // user corpus that aggregates prod over connector cubes.
    def pieces(v: String, m: String, i: Int): (Seq[Column], Column) = {
      val v0 = col(v).cast("double")
      val vv = when(v0 <= lit(Double.PositiveInfinity), v0)
      m match {
        case "std" | "var" =>
          val (n, s1, s2) = (s"__rs_n_$i", s"__rs_s1_$i", s"__rs_s2_$i")
          // StatsOps.foldVariance carries the shared Spark-exact
          // degenerate semantics (null below 2 values — Spark's own
          // var_samp contract, probed in StatsRobustnessSpec), the
          // cancellation clamp (greatest(raw, 0) against sqrt(-ε)) and
          // the overflow guard (non-finite raw moment → NaN, matching
          // the row path's own overflow)
          val variance = StatsOps.foldVariance(col(n), col(s1), col(s2))
          (Seq(count(vv).as(n), sum(vv).as(s1), sum(vv * vv).as(s2)),
            (if (m == "std") sqrt(variance) else variance).as(s"${v}_$m"))
        case "any" | "all" =>
          // truthiness as extremes of |v|: any ⇔ max|v| > 0, all ⇔
          // min|v| > 0 — exact down to subnormals (the earlier squared
          // form underflowed below ~1.5e-154), and ABS(CASE ...) is a
          // translatable pushed column the connectors fold per chunk.
          // All-NaN buckets give a null extreme → null, like bool_or
          val t = s"__rs_b_$i"
          (Seq((if (m == "any") max(abs(vv)) else min(abs(vv))).as(t)),
            (col(t) > 0).as(s"${v}_$m"))
        case _ =>
          (Seq(methodAgg(m, col(v), col(timeDim)).as(s"${v}_$m")),
            col(s"${v}_$m"))
      }
    }
    val ps = aggs.zipWithIndex.map { case ((v, m), i) => pieces(v, m, i) }
    val aggCols = ps.flatMap(_._1)
    // extra keys (the spatial cell of a per-cell resample) ride along as
    // plain dim keys — still connector-foldable
    val (keys, start) = numericKeys(timeDim, unitSeconds, freq)
    val outCols = extraKeys.map(col) ++ ps.map(_._2)
    df.groupBy(keys ++ extraKeys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(start.as(labelCol) +: outCols: _*)
  }

  /** resample_in_time `median`/`percentile_<p>` THROUGH the connector —
    * the grouped companion of [[QuantileOps.quantileFold]] (reference
    * resampling/temporal.py:17-161; also get_time_series' median, the
    * one aggregate xcube MUST_LOAD the whole array for,
    * timeseries.py:40-47). Exact `percentile_cont` per bucket, with
    * every data pass a pushed chunk-foldable aggregate:
    *
    *  - pass 0: per-bucket guarded count + global min/max (folds per
    *    chunk; sidecar-answered on ANALYZEd stores);
    *  - pass 1: the (bucket keys × value-bucket) histogram under the
    *    consumed global value interval — O(chunks × buckets × bins)
    *    partial rows, never O(cells); the running-total window and the
    *    rank→bucket join see histogram rows only;
    *  - pass 2: a distinct-value histogram of ONLY the straddling value
    *    buckets, fetched under a consumed same-column Or of their EXACT
    *    value intervals (bit-searched boundaries, so the filtered set
    *    equals the counted buckets bit-for-bit) — chunk- and
    *    sidecar-pruned; the per-(bucket, rank) window resolves the order
    *    statistics and `lower + (upper − lower)·frac` interpolates.
    *
    * All-NaN buckets emit null rows like [[resampleInTime]]; constant
    * and empty inputs short-circuit; a degenerate refinement width
    * falls back to the row-path percentile (still exact, just not
    * pushed). Single refinement level: the exact finish's window is
    * bounded by the straddling buckets' distinct values (≈ cells/bins
    * per straddler) — raise `bins` for pathological skew. */
  def resampleQuantileFold(df: DataFrame, timeDim: String,
                           unitSeconds: Double, freq: String, vCol: String,
                           p: Double, bins: Int = 1024,
                           labelCol: String = "t",
                           methodName: Option[String] = None): DataFrame =
    resampleQuantileFoldMulti(df, timeDim, unitSeconds, freq, vCol,
      Seq(p), bins, labelCol, methodName.map(Seq(_)))

  /** [[resampleQuantileFold]] for a PERCENTILE TABLE: every fraction in
    * `ps` shares pass 0 (bucket counts + extremes), the single pass-1
    * value-bucket histogram, and one pass-2 straddler rescan — quartiles
    * per bucket cost the same three connector passes as one median, not
    * 3×. One output column per fraction (`<var>_median`,
    * `<var>_percentile_<p>`), same all-NaN/degenerate contracts. */
  def resampleQuantileFoldMulti(df: DataFrame, timeDim: String,
                                unitSeconds: Double, freq: String,
                                vCol: String, ps: Seq[Double],
                                bins: Int = 1024, labelCol: String = "t",
                                methodNames: Option[Seq[String]] = None)
      : DataFrame = {
    methodNames.foreach(ns => require(ns.length == ps.length,
      s"${ns.length} names for ${ps.length} fractions"))
    val outNames = ps.indices.map(i => methodNames.map(_(i)).getOrElse(
      defaultQuantileName(vCol, ps(i))))
    val (keys, start) = numericKeys(timeDim, unitSeconds, freq)
    val folded = quantileFoldKeyed(df, keys, vCol, ps, outNames, bins)
    folded.select(start.as(labelCol) +: outNames.map(col): _*)
  }

  /** Exact per-GROUP quantiles of a double column by ARBITRARY group
    * keys — the per-domain/per-source percentile-cut shape of a
    * curation pipeline, and the grouped double-typed companion of
    * [[graft.operators.QuantileOps.exactQuantilesBy]] (which is
    * long-valued). Same machinery as [[resampleQuantileFoldMulti]]:
    * every fraction shares the three passes, every pass is
    * chunk-foldable through a connector, and no per-group sort state
    * ever exceeds histogram size. */
  def groupedQuantileFold(df: DataFrame, groupCols: Seq[String],
                          vCol: String, ps: Seq[Double],
                          bins: Int = 1024,
                          maxGroups: Int = MaxFoldGroups): DataFrame = {
    require(groupCols.nonEmpty, "use QuantileOps.quantileFold ungrouped")
    val outNames = ps.map(defaultQuantileName(vCol, _))
    quantileFoldKeyed(df, groupCols.map(col), vCol, ps, outNames, bins,
      maxGroups)
  }

  private def defaultQuantileName(vCol: String, p: Double): String = {
    val pct = p * 100
    if (p == 0.5) s"${vCol}_median"
    else if (pct == math.rint(pct)) s"${vCol}_percentile_${pct.toLong}"
    else s"${vCol}_percentile_$pct".replace('.', '_') // dot-free column
  }

  /** The shared keyed quantile fold: returns one row per group with the
    * group-key columns (names taken from the grouped plan) followed by
    * one exact `percentile_cont` column per fraction. */
  /** Ceiling on the group cardinality the keyed quantile fold will
    * collect driver-side (pass-0 group rows, then ≤ 2 × fractions rank
    * rows per group). 2^20 groups × ~3 small columns is tens of MB —
    * comfortably driver-sized — while anything wider is a key the
    * caller should coarsen or a job percentile_approx serves better. */
  val MaxFoldGroups: Int = 1 << 20

  private def quantileFoldKeyed(df: DataFrame, keys: Seq[Column],
                                vCol: String, ps: Seq[Double],
                                outNames: Seq[String], bins: Int,
                                maxGroups: Int = MaxFoldGroups)
      : DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile fractions out of range: $ps")
    require(ps.distinct.length == ps.length, s"duplicate fractions: $ps")
    require(bins >= 2, s"need at least 2 refinement bins, got $bins")
    val v0 = col(vCol).cast("double")
    val vv = when(v0 <= lit(Double.PositiveInfinity), v0)
    // pass 0, ONE job: per-bucket guarded count PLUS per-bucket min/max
    // (the global value interval derives driver-side from the bucket
    // extremes) — folds per chunk, sidecar-answered on ANALYZEd stores.
    // The bucket rows are collected once (bucket-count-sized, the same
    // bound as every other collect here) and re-enter the plan as a
    // LOCAL relation, so neither the rank probe, the pass-2 join, nor
    // the final domain join re-executes the pass-0/pass-1 scan lineage:
    // each connector pass runs exactly once.
    val grpDist = df.groupBy(keys: _*).agg(count(vv).as("__n"),
      min(vv).as("__mn"), max(vv).as("__mx"))
    val keyNames = grpDist.columns.dropRight(3).toSeq
    // every collect below is O(groups)-bounded; for time-bucket
    // resampling that is calendar-sized, but groupedQuantileFold
    // advertises ARBITRARY keys — cap the cardinality with a loud
    // error (the exactCap discipline) instead of letting a
    // high-cardinality key column grow the driver without a guard.
    // limit(cap + 1) proves the bound and returns the COMPLETE group
    // set whenever it holds (≤ cap rows exist ⇒ all of them return).
    val grpRows = grpDist.limit(maxGroups + 1).collect()
    require(grpRows.length <= maxGroups,
      s"grouped quantile fold over more than $maxGroups groups " +
        "would collect O(groups) rows on the driver — coarsen the " +
        "group key, or use percentile_approx for key spaces this wide")
    val spark = df.sparkSession
    val grp = spark.createDataFrame(
      java.util.Arrays.asList(grpRows: _*), grpDist.schema)
      .drop("__mn", "__mx")
    val mnAt = keyNames.length + 1
    val finiteMins = grpRows.filter(!_.isNullAt(mnAt))
    if (finiteMins.isEmpty) // empty or all-NaN input: every bucket is null
      return grp.select(keyNames.map(col) ++
        outNames.map(n => lit(null).cast("double").as(n)): _*)
    val lo = finiteMins.map(_.getDouble(mnAt)).min
    val hi = grpRows.filter(!_.isNullAt(mnAt + 1))
      .map(_.getDouble(mnAt + 1)).max
    if (lo == hi) // constant variable: the quantile of any valid bucket
      return grp.select(keyNames.map(col) ++
        outNames.map(n => when(col("__n") > 0, lit(lo)).as(n)): _*)
    val w = (hi - lo) / bins
    if (!java.lang.Double.isFinite(w) || w <= 0.0) // ±huge range overflow
      return df.groupBy(keys: _*)
        .agg(percentile(vv, lit(ps.head)).as(outNames.head),
          ps.indices.tail.map(i =>
            percentile(vv, lit(ps(i))).as(outNames(i))): _*)
    // per-bucket rank targets PER FRACTION: idx = p·(n−1); each result
    // interpolates the 1-indexed order statistics ⌊idx⌋+1, ⌊idx⌋+2. All
    // fractions ride one rank table (__pi tags the fraction), so the
    // histogram passes below are shared.
    val live = grp.filter(col("__n") > 0)
    val ranks = ps.indices.map { i =>
      val idx = lit(ps(i)) * (col("__n") - 1)
      val rk = live
        .withColumn("__k", floor(idx).cast("long"))
        .withColumn("__frac", idx - floor(idx))
      rk.select(keyNames.map(col) :+ lit(i).as("__pi") :+
          (col("__k") + 1).as("__rank") :+ lit(0).as("__which") :+
          col("__frac"): _*)
        .unionByName(rk.filter(col("__frac") > 0)
          .select(keyNames.map(col) :+ lit(i).as("__pi") :+
            (col("__k") + 2).as("__rank") :+ lit(1).as("__which") :+
            col("__frac"): _*))
    }.reduce(_ unionByName _)
    // pass 1: the pushed (bucket keys × value bucket) histogram
    val bucket = floor((v0 - lit(lo)) / lit(w)).as("__bk")
    val hist = df.filter(v0 >= lo && v0 <= hi)
      .groupBy(keys :+ bucket: _*).agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy(keyNames.map(col): _*).orderBy("__bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("__cb",
      coalesce(sum(col("__c")).over(wcum), lit(0L)))
    // the straddler table is (≤ 2 rank rows per bucket)-sized: collect it
    // ONCE — this is the single execution of the pass-1 histogram — and
    // re-enter it as a local relation for the pass-2 join
    val targetDist = ranks.join(cum, keyNames)
      .filter(col("__rank") > col("__cb") &&
        col("__rank") <= col("__cb") + col("__c"))
      .select(keyNames.map(col) :+ col("__pi") :+ col("__bk") :+
        col("__rank") :+ col("__which") :+ col("__frac") :+ col("__cb"): _*)
    val targetRows = targetDist.collect()
    val target = spark.createDataFrame(
      java.util.Arrays.asList(targetRows: _*), targetDist.schema)
    // straddling value buckets → exact inclusive intervals (binary search
    // over the double bit space, QuantileOps.bucketBounds) → one consumed
    // same-column Or the scan prunes chunks with
    val bks = targetRows.map(_.getLong(keyNames.length + 1)).distinct.sorted
    val orFilter = bks.map { b =>
      val (a, c) = QuantileOps.bucketBounds(lo, hi, w, b)
      v0 >= a && v0 <= c
    }.reduce(_ || _)
    // pass 2: distinct-value histogram of the straddlers, rank windows
    val inb = df.filter(orFilter)
      .groupBy(keys :+ v0.as("__v"): _*).agg(count(lit(1)).as("__vc"))
      .withColumn("__bk", floor((col("__v") - lit(lo)) / lit(w)))
    val joined = inb.join(broadcast(target), keyNames :+ "__bk")
    val wv = Window
      .partitionBy((keyNames :+ "__pi" :+ "__rank").map(col): _*)
      .orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    val picked = joined
      .withColumn("__cb2",
        col("__cb") + coalesce(sum(col("__vc")).over(wv), lit(0L)))
      .filter(col("__rank") > col("__cb2") &&
        col("__rank") <= col("__cb2") + col("__vc"))
    val pAggs = ps.indices.flatMap { i =>
      Seq(max(when(col("__pi") === i && col("__which") === 0, col("__v")))
          .as(s"__lo_$i"),
        max(when(col("__pi") === i && col("__which") === 1, col("__v")))
          .as(s"__hi_$i"),
        max(when(col("__pi") === i, col("__frac"))).as(s"__f_$i"))
    }
    val pCols = ps.indices.map { i =>
      val lo0 = col(s"__lo_$i"); val hi0 = col(s"__hi_$i")
      val f = col(s"__f_$i")
      when(f <= 0 || lo0 === hi0, lo0)
        // delta form matches DuckDB quantile_cont on finite values; an
        // infinite endpoint makes (hi − lo) NaN where the weighted form
        // is still exact — same guard as QuantileOps.quantileFold
        .when(abs(lo0) === lit(Double.PositiveInfinity) ||
            abs(hi0) === lit(Double.PositiveInfinity),
          lo0 * (lit(1.0) - f) + hi0 * f)
        .otherwise(lo0 + (hi0 - lo0) * f)
        .as(outNames(i))
    }
    val byGroup = picked.groupBy(keyNames.map(col): _*)
      .agg(pAggs.head, pAggs.tail: _*)
      .select(keyNames.map(col) ++ pCols: _*)
    // all-NaN buckets re-join the bucket domain as null rows
    grp.join(byGroup, keyNames, "left_outer")
      .select(keyNames.map(col) ++ outNames.map(col): _*)
  }

  /** Above this many collected gather values, the two-phase folds
    * switch from an In-literal filter to a broadcast left-semi join —
    * a decade-long hourly resample would otherwise plant ~88k literals
    * in one In expression (driver memory + analyzer blowup). */
  val InLiteralLimit = 4096

  /** The phase-2 candidate frame of a two-phase fold: an In filter over
    * the collected value set while it is literal-sized (the connectors
    * consume In into interval sets and prune chunks with it), a
    * broadcast left-semi join above [[InLiteralLimit]] (same rows; the
    * scan still prunes through the runtime-filter path where the
    * source supports it). */
  private def gatherBy(df: DataFrame, c: Column, values: Seq[Double],
                       inLimit: Int): DataFrame =
    if (values.isEmpty) df.filter(lit(false))
    else if (values.length <= inLimit) df.filter(c.isin(values: _*))
    else {
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(values.toDF("__gather")), c === col("__gather"),
        "left_semi")
    }

  /** resample first/last FROM a connector as the two-phase fold it is:
    * phase 1 pushes `min/max(CASE WHEN v <= +Inf THEN t END)` — the
    * first/last VALID time per bucket, a cross-guarded partial the scan
    * folds per chunk — and collects the (bucket-count-sized) time set;
    * phase 2 gathers exactly those time slices back through the scan
    * (the In filter on the time dim prunes chunks; above
    * [[InLiteralLimit]] values a broadcast semi-join replaces the
    * literal In) and finishes with min_by/max_by. The result is then
    * LEFT-JOINED against phase 1's bucket domain, so a bucket whose
    * variables are ALL NaN still emits its row with null values —
    * exactly the row-path resampleInTime contract, with deterministic
    * output shape. Exchange O(buckets), reads O(selected slices) —
    * never O(cells). */
  def resampleFirstLastFold(df: DataFrame, timeDim: String,
                            unitSeconds: Double, freq: String,
                            vars: Seq[String], last: Boolean = false,
                            extraKeys: Seq[String] = Nil,
                            labelCol: String = "t",
                            inLiteralLimit: Int = InLiteralLimit): DataFrame = {
    require(vars.nonEmpty, "resampleFirstLastFold needs at least one var")
    val (keys, start) = numericKeys(timeDim, unitSeconds, freq)
    val keyCols = keys ++ extraKeys.map(col)
    val mName = if (last) "last" else "first"
    val tAggs = vars.zipWithIndex.map { case (v, i) =>
      val v0 = col(v).cast("double")
      val g = when(v0 <= lit(Double.PositiveInfinity), col(timeDim))
      (if (last) max(g) else min(g)).as(s"__ft_$i")
    }
    val p1 = df.groupBy(keyCols: _*).agg(tAggs.head, tAggs.tail: _*)
    val keyNames = p1.columns.take(keyCols.length).toSeq
    val times = p1
      .select(explode(array(vars.indices.map(i => col(s"__ft_$i")): _*))
        .as("t0"))
      .filter(col("t0").isNotNull).distinct()
      .collect().map(_.getDouble(0)).toSeq
    val cand = gatherBy(df, col(timeDim), times, inLiteralLimit)
    val vAggs = vars.map { v =>
      val v0 = col(v).cast("double")
      val vv = when(v0 <= lit(Double.PositiveInfinity), v0)
      val validT = when(vv.isNotNull, col(timeDim))
      (if (last) max_by(vv, validT) else min_by(vv, validT))
        .as(s"${v}_$mName")
    }
    val p2 = cand.groupBy(keyCols: _*).agg(vAggs.head, vAggs.tail: _*)
    // phase 1's key rows ARE the bucket domain (bucket-count-sized):
    // all-NaN buckets gather nothing and must still emit null rows
    p1.select(keyNames.map(col): _*).join(p2, keyNames, "left_outer")
      .select(start.as(labelCol) +:
        (extraKeys.map(col) ++ vars.map(v => col(s"${v}_$mName"))): _*)
  }

  /** resample argmax/argmin FROM a connector, two-phase: phase 1 pushes
    * the per-bucket extreme of the NaN-guarded variable (folds per
    * chunk) and collects the (bucket-count-sized) extreme-value set;
    * phase 2 re-scans with `v IN (extremes)` — a consumed VALUE
    * predicate, so only matching cells leave the reader and an ANALYZE
    * sidecar prunes whole chunks (a broadcast semi-join replaces the
    * literal In above [[InLiteralLimit]] values) — and finishes with
    * methodAgg's exact argmax/argmin (ties to the latest/earliest time
    * via the (value, time) struct ordering). A bucket's own extreme
    * rows are always in the candidate set and no candidate in a bucket
    * beats its own extreme, so the two-phase result equals the
    * one-pass one exactly. The finish is LEFT-JOINED against phase 1's
    * bucket domain so all-NaN buckets emit null rows exactly like the
    * row path. */
  def resampleArgFold(df: DataFrame, timeDim: String, unitSeconds: Double,
                      freq: String, v: String, argmax: Boolean = true,
                      extraKeys: Seq[String] = Nil,
                      labelCol: String = "t",
                      inLiteralLimit: Int = InLiteralLimit): DataFrame = {
    val (keys, start) = numericKeys(timeDim, unitSeconds, freq)
    val keyCols = keys ++ extraKeys.map(col)
    val v0 = col(v).cast("double")
    val vv = when(v0 <= lit(Double.PositiveInfinity), v0)
    val p1 = df.groupBy(keyCols: _*)
      .agg((if (argmax) max(vv) else min(vv)).as("__m"))
    val keyNames = p1.columns.take(keyCols.length).toSeq
    val exts = p1.select(col("__m")).filter(col("__m").isNotNull)
      .distinct().collect().map(_.getDouble(0)).toSeq
    val cand = gatherBy(df, col(v), exts, inLiteralLimit)
    val mName = if (argmax) "argmax" else "argmin"
    val p2 = cand.groupBy(keyCols: _*)
      .agg(methodAgg(mName, col(v), col(timeDim)).as(s"${v}_$mName"))
    p1.select(keyNames.map(col): _*).join(p2, keyNames, "left_outer")
      .select(start.as(labelCol) +:
        (extraKeys.map(col) :+ col(s"${v}_$mName")): _*)
  }

  /** max_valids (webapi/timeseries/controllers.py:301-331): keep the N most
    * recent rows per key satisfying `valid`, deterministic order by
    * (time desc, tiebreak desc). Per-key window — no global sort.
    */
  def maxValids(df: DataFrame, keys: Seq[String], timeCol: String,
                valid: Column, n: Int, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).desc, col(tiebreak).desc)
    df.filter(valid)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  // ------------------------------------------------------- upsampling

  private def orderedWindow(keys: Seq[String], timeCol: String) =
    Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))

  /** Forward-fill: latest non-null value at or before each row. */
  def ffill(df: DataFrame, keys: Seq[String], timeCol: String,
            valueCol: String, outCol: String): DataFrame = {
    val w = orderedWindow(keys, timeCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Backward-fill: earliest non-null value at or after each row. */
  def bfill(df: DataFrame, keys: Seq[String], timeCol: String,
            valueCol: String, outCol: String): DataFrame = {
    val w = orderedWindow(keys, timeCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(outCol, first(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Nearest-valid fill (temporal.py upsampling method "nearest"): the
    * closer of the previous/next non-null value by time distance; ties
    * prefer the previous value (deterministic). With `tolerance` set, rows
    * farther than it from both neighbours stay null (pandas reindex
    * tolerance semantics).
    */
  def nearestFill(df: DataFrame, keys: Seq[String], timeCol: String,
                  valueCol: String, outCol: String,
                  timeAsNum: Column => Column,
                  tolerance: Option[Double] = None): DataFrame = {
    val wPrev = orderedWindow(keys, timeCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = orderedWindow(keys, timeCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val validT = when(v.isNotNull, col(timeCol))
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(validT, ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(validT, ignoreNulls = true).over(wNext)
    val tN = timeAsNum(col(timeCol))
    val dPrev = tN - timeAsNum(prevT)
    val dNext = timeAsNum(nextT) - tN
    def guard(value: Column, dist: Column): Column = tolerance match {
      case Some(tol) => when(dist <= tol, value)
      case None => value
    }
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNull && nextV.isNull, lit(null))
        .when(prevV.isNull, guard(nextV, dNext))
        .when(nextV.isNull, guard(prevV, dPrev))
        .when(dPrev <= dNext, guard(prevV, dPrev))
        .otherwise(guard(nextV, dNext)))
  }

  /** Linear interpolation between the surrounding non-null values, weighted
    * by time distance; endpoints fall back to the nearest valid value
    * (pandas `interpolate(limit_direction="both")`, temporal.py:156-161).
    * `timeAsNum` maps the time column to a numeric axis (e.g. epoch seconds
    * or day ordinal).
    */
  def interpolate(df: DataFrame, keys: Seq[String], timeCol: String,
                  valueCol: String, outCol: String,
                  timeAsNum: Column => Column): DataFrame = {
    val wPrev = orderedWindow(keys, timeCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = orderedWindow(keys, timeCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val validT = when(v.isNotNull, col(timeCol))
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevT = last(validT, ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextT = first(validT, ignoreNulls = true).over(wNext)
    val tN = timeAsNum(col(timeCol))
    val frac = (tN - timeAsNum(prevT)) / (timeAsNum(nextT) - timeAsNum(prevT))
    df.withColumn(outCol,
      when(v.isNotNull, v)
        .when(prevV.isNull, nextV)
        .when(nextV.isNull, prevV)
        .otherwise(prevV + (nextV - prevV) * frac))
  }
}
