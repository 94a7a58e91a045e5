package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed physical layout for big fact-fact joins: tables bucketed AND
  * sorted on the join key join with zero Exchange and zero Sort — the
  * cure for the one unavoidable-looking shuffle in fact⋈fact queries
  * (lineitem ⋈ orders on orderkey). At 100 TB this turns the dominant
  * network cost of the pricing-join family into a local merge per bucket.
  *
  * Uses the session catalog's warehouse (saveAsTable — bucket metadata
  * lives in the catalog; plain parquet paths can't carry it).
  */
object BucketedLayout {

  /** Write `df` bucketed+sorted by `key` into catalog table `table`.
    * Drops a pre-existing table AND its warehouse directory first — with
    * the in-memory catalog a leftover directory from an earlier session
    * would otherwise block the create.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Open a bucketed catalog table. */
  def openBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
