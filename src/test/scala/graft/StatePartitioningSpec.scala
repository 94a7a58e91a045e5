package graft

import graft.streaming.StatePartitioning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-adaptive state-partition derivation: sized by input bytes
  * against the advisory partition size, floored at MinPartitions, capped
  * at the configured shuffle partitions — and a streaming query started
  * from the derived session produces the exact same converged result.
  */
class StatePartitioningSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get()

  test("derivation: floor, size-proportional middle, configured ceiling") {
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    assert(StatePartitioning.derivedPartitions(spark, 0L) ===
      math.min(StatePartitioning.MinPartitions, conf))
    assert(StatePartitioning.derivedPartitions(spark, advisory * 10) ===
      math.min(10, conf))
    // a 100 TB input saturates the configured count — never sized up
    assert(StatePartitioning.derivedPartitions(spark,
      100L * 1024 * 1024 * 1024 * 1024) === conf)
  }

  test("sessionFor overrides only the twin, and the stream result matches") {
    val d = "/root/testdata/sf0.001"
    val ss = StatePartitioning.sessionFor(spark, s"$d/events.parquet")
    assert(ss ne spark)
    assert(ss.conf.get("spark.sql.shuffle.partitions").toInt ===
      StatePartitioning.MinPartitions)
    // parent session untouched
    assert(spark.conf.get("spark.sql.shuffle.partitions").toInt === 32 ||
      spark.conf.get("spark.sql.shuffle.partitions").toInt > 0)
    val schema = GraftSession.table(spark, d, "events").schema
    val stream = ss.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .transform(GraftSession.normalizeTs(_))
      .withWatermark("ts", "1 day")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tbl = s"state_part_spec_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(tbl)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = ss.table(tbl).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = GraftSession.events(spark, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exp)
  }
}
