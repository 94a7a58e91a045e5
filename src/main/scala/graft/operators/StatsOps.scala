package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** compute_statistics + density histogram (reference
  * webapi/statistics/controllers.py:45-129): one aggregation pass for the
  * scalar stats, and the reference's 2-pass histogram — min/max first, then
  * a single bucket-index groupBy (the relational width_bucket).
  *
  * The second pass shuffles only 100 bucket keys; the min/max scalars are
  * the only driver-side values (the reference collects the same two).
  */
object StatsOps {

  /** NaN-skipping count/min/max/mean/std in one pass. */
  def statistics(df: DataFrame, vCol: String): DataFrame = {
    val v = when(!isnan(col(vCol).cast("double")), col(vCol).cast("double"))
    df.agg(
      count(v).as("n"),
      min(v).as("v_min"),
      max(v).as("v_max"),
      round(avg(v), 6).as("v_mean"),
      round(stddev_samp(v), 6).as("v_std"))
  }

  /** Per-label statistics for variables carrying extra NON-SPATIAL dims
    * (depth, wavelength — reference 1.13.3 #1213, statistics over extra
    * dims via `get_non_spatial_labels` in xcube/core/tile.py): the same
    * NaN-skipping stat set as [[statistics]], grouped by the extra-dim
    * label columns. One map-side-combined shuffle over the (tiny) label
    * key space — the label cardinality is dimension-sized, not data-sized.
    */
  def statisticsBy(df: DataFrame, vCol: String, keys: Seq[String]): DataFrame = {
    val v = when(!isnan(col(vCol).cast("double")), col(vCol).cast("double"))
    df.groupBy(keys.map(col): _*).agg(
      count(v).as("n"),
      min(v).as("v_min"),
      max(v).as("v_max"),
      round(avg(v), 6).as("v_mean"),
      round(stddev_samp(v), 6).as("v_std"))
  }

  /** [[statistics]] in the connector-foldable form: the NaN guard is the
    * DSv2-translatable `v <= +Inf` CASE (ISNAN does not translate) and
    * the sample std comes from count/sum/sum-of-squares partials — the
    * only aggregates Spark partial-pushes — finished above the scan, so
    * over format("zarr")/netcdf/kerchunk the whole pass folds per chunk
    * (ZarrVarAggScan squared Sum specs): one partial row per chunk
    * crosses the exchange, never O(cells). Numerically this is the
    * one-pass moment formula (vs [[statistics]]' Welford merge) — exact
    * for the bounded-magnitude dyadic-valued gates and fine for
    * geophysical ranges. Degenerate semantics are Spark's own, pinned
    * empirically in StatsRobustnessSpec: null below 2 values, the
    * cancellation residue clamped at zero (a large-magnitude low-spread
    * group must read ~0, never sqrt(-ε) = NaN), and second-moment
    * overflow (|v| beyond ~1e154) reads NaN exactly like stddev_samp's
    * own merge does on the same inputs.
    */
  def statisticsFold(df: DataFrame, vCol: String): DataFrame = {
    val v0 = col(vCol).cast("double")
    val v = when(v0 <= lit(Double.PositiveInfinity), v0)
    df.agg(count(v).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        min(v).as("v_min"), max(v).as("v_max"))
      .select(col("n"), col("v_min"), col("v_max"),
        round(col("s1") / col("n"), 6).as("v_mean"),
        round(foldStd(col("n"), col("s1"), col("s2")), 6).as("v_std"))
  }

  /** Sample variance from the moment partials with var_samp's EXACT
    * degenerate semantics — pinned empirically against Spark 4's own
    * aggregate in StatsRobustnessSpec, shared with [[graft.operators
    * .TemporalOps.resampleInTimeNumeric]]'s std/var pieces:
    *
    *  - n ≤ 1 → null (Spark's var_samp with the legacy statistical
    *    aggregate OFF returns null below 2 values, not NaN);
    *  - finite raw moment → `greatest(raw, 0)`: the cancellation clamp —
    *    a large-magnitude low-spread group can leave a tiny NEGATIVE
    *    one-pass numerator that sqrt would surface as NaN;
    *  - non-finite raw (|v| beyond ~1e154 overflows the second moment;
    *    Inf − Inf reads NaN, huge spreads read +Inf) → NaN, which is
    *    what Spark's own merge overflows to on the same inputs (probed:
    *    both constant 1e300 and ±1e300 give NaN on the row path). */
  private[operators] def foldVariance(n: Column, s1: Column,
                                      s2: Column): Column = {
    val raw = (s2 - s1 * s1 / n) / (n - lit(1))
    when(n <= 1, lit(null))
      .when(abs(raw) <= lit(Double.MaxValue), greatest(raw, lit(0.0)))
      .otherwise(lit(Double.NaN))
  }

  private[operators] def foldStd(n: Column, s1: Column, s2: Column): Column =
    sqrt(foldVariance(n, s1, s2))

  /** [[statisticsBy]] in the connector-foldable form — the per-label
    * (extra-dim) variant of [[statisticsFold]]: same NaN-guarded
    * count/sum/sumsq/min/max partials, grouped by the label columns
    * (plain dim keys, foldable), sample std finished above the scan. */
  def statisticsFoldBy(df: DataFrame, vCol: String,
                       keys: Seq[String]): DataFrame = {
    val v0 = col(vCol).cast("double")
    val v = when(v0 <= lit(Double.PositiveInfinity), v0)
    df.groupBy(keys.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        min(v).as("v_min"), max(v).as("v_max"))
      .select(keys.map(col) ++ Seq(col("n"), col("v_min"), col("v_max"),
        round(col("s1") / col("n"), 6).as("v_mean"),
        round(foldStd(col("n"), col("s1"), col("s2")), 6).as("v_std")): _*)
  }

  /** [[histogram]] in the connector-foldable form: both passes push.
    * Pass 1 (min/max/count with the translatable NaN guard) folds per
    * chunk; pass 2 groups by the single-divide bucket key
    * `floor((v - lo) / w)` — the value-derived group key the connectors
    * accept — and counts the guarded column, so NaN cells contribute
    * nothing wherever their raw bits land. The half-open top edge is
    * restored ABOVE the aggregate (bucket `bins` merges into
    * `bins − 1`), keeping the pushed key shape primitive. O(chunks ×
    * bins) partial rows cross the exchange.
    */
  def histogramFold(df: DataFrame, vCol: String, bins: Int): DataFrame = {
    val v0 = col(vCol).cast("double")
    val v = when(v0 <= lit(Double.PositiveInfinity), v0)
    val row = df.agg(min(v), max(v), count(v)).head()
    if (row.isNullAt(0)) return emptyHistogram(df) // no non-NaN cell
    val (lo, hi) = expandIfZeroWidth(row.getDouble(0), row.getDouble(1))
    val n = row.getLong(2)
    val w = (hi - lo) / bins
    val counts = df
      .groupBy(floor((v0 - lit(lo)) / lit(w)).as("b"))
      .agg(count(v).as("cnt"))
      .select(least(col("b"), lit(bins - 1L)).as("bucket"), col("cnt"))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    df.sparkSession.range(bins).withColumnRenamed("id", "bucket")
      .join(counts, Seq("bucket"), "left_outer")
      .select(col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("n"),
        round(coalesce(col("cnt"), lit(0L)).cast("double") /
          (lit(n.toDouble) * lit(w)), 6).as("density"))
  }

  /** Density histogram with `bins` equal-width buckets over [min, max];
    * returns ALL buckets (empty ones included) with count and density
    * (count / (n · binWidth)), like np.histogram(density=True).
    */
  def histogram(df: DataFrame, vCol: String, bins: Int): DataFrame = {
    val v0 = col(vCol).cast("double")
    val row = df.filter(!isnan(v0)).agg(min(v0), max(v0), count(v0)).head()
    if (row.isNullAt(0)) return emptyHistogram(df) // no non-NaN cell
    val (lo, hi) = expandIfZeroWidth(row.getDouble(0), row.getDouble(1))
    val n = row.getLong(2)
    val binW = (hi - lo) / bins
    val bucket = least(floor(((v0 - lit(lo)) / (lit(hi) - lit(lo))) * bins),
      lit(bins - 1L)).cast("long").as("bucket")
    val counts = df.filter(!isnan(v0)).groupBy(bucket).agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(bins).withColumnRenamed("id", "bucket")
      .join(counts, Seq("bucket"), "left_outer")
      .select(col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("n"),
        round(coalesce(col("cnt"), lit(0L)).cast("double") / (lit(n.toDouble) * lit(binW)), 6)
          .as("density"))
  }

  /** np.histogram's degenerate-range rule: an all-equal variable expands
    * the range to [v − 0.5, v + 0.5] (numpy `_get_outer_edges`) instead
    * of dividing by a zero width into NaN buckets. Shared by both
    * histogram paths so fold == row path on constant inputs. */
  private def expandIfZeroWidth(lo: Double, hi: Double): (Double, Double) =
    if (lo == hi) (lo - 0.5, hi + 0.5) else (lo, hi)

  /** The empty/all-NaN histogram: zero rows, same schema — there is no
    * range to bucket (np.histogram without an explicit range refuses the
    * same input). */
  private def emptyHistogram(df: DataFrame): DataFrame =
    df.sparkSession.range(0).select(col("id").as("bucket"),
      lit(0L).as("n"), lit(0.0).as("density"))
}
