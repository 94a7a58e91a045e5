package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient joins: when one join key carries a disproportionate share
  * of the fact rows, a plain hash join sends that key's entire volume to a
  * single task. Salting splits each hot key into `salts` sub-keys — the
  * fact side picks a deterministic salt per row, the (small) other side is
  * replicated across all salts — so the hot key spreads over `salts` tasks.
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (spark.sql.adaptive.skewJoin, on by default in GraftSession); explicit
  * salting remains the tool for aggregations and for joins AQE can't split
  * (e.g. bucketed or broadcast-ineligible shapes).
  */
object SkewOps {

  /** Deterministic per-row salt in [0, salts). */
  def saltCol(salts: Int, from: Column*): Column =
    pmod(hash(from: _*), lit(salts))

  /** Inner-join `fact` to `dim` on `key`, with the fact side salted and the
    * dim side replicated `salts` times. Result equals the plain join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      saltCol(salts, fact.columns.map(col).toSeq: _*))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final aggregate on key — the manual map-side-combine for
    * aggregates whose partial form the engine can't derive (e.g. exact
    * percentiles are NOT salt-decomposable; sums/counts/min/max are).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int, out: String): DataFrame =
    df.withColumn("__salt", saltCol(salts, df.columns.map(col).toSeq: _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(out))
}
