package graft.sources.s3

import graft.sources.ByteStore
import org.apache.spark.sql.SparkSession

/** One-call wiring of the in-JVM S3 endpoint into BOTH IO layers:
  * Spark/Hadoop (`spark.read.parquet("s3g://...")`, committer renames) and
  * the [[graft.sources.ByteStore]] path the chunked stores (Zarr) use.
  * On a production cluster the same two settings point at a real object
  * store via `s3a` — the query code is identical.
  */
object S3Support {
  def enable(spark: SparkSession, endpoint: String = S3Emulator.shared.endpoint): Unit = {
    val impl = classOf[S3GraftFileSystem].getName
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3g.impl", impl)
    hc.set("fs.s3g.endpoint", endpoint)
    ByteStore.register("fs.s3g.impl", impl)
    ByteStore.register("fs.s3g.endpoint", endpoint)
  }
}
