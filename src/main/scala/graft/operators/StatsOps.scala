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
    * geophysical ranges; extreme-dynamic-range data should use
    * [[statistics]] on the row path.
    */
  def statisticsFold(df: DataFrame, vCol: String): DataFrame = {
    val v0 = col(vCol).cast("double")
    val v = when(v0 <= lit(Double.PositiveInfinity), v0)
    df.agg(count(v).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        min(v).as("v_min"), max(v).as("v_max"))
      .select(col("n"), col("v_min"), col("v_max"),
        round(col("s1") / col("n"), 6).as("v_mean"),
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - 1)), 6).as("v_std"))
  }

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
        round(sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
          (col("n") - 1)), 6).as("v_std")): _*)
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
    val (lo, hi, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
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
    val (lo, hi, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
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
}
