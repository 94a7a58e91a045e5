package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry in `queries` runs against the testdata dir passed by the
  * driver; each entry in `oracleSql` is the DuckDB-ANSI equivalent over the
  * same parquet tables. Column names (including aliases of every computed
  * column) MUST match between the two — the driver sorts columns by name
  * before hashing.
  *
  * Convention for float determinism: any order-dependent double aggregate
  * (sum/avg/stddev/percentile over doubles) is rounded to 6 decimals on BOTH
  * sides so Spark-vs-DuckDB summation order can't flip the hash.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
