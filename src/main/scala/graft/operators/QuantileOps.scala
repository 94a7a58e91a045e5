package graft.operators

import org.apache.spark.sql.DataFrame
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
}
