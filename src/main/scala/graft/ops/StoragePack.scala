package graft.ops

import graft.{GraftSession, QueryPack}
import graft.sources.CubeWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Physical-layout + streaming pack (SURVEY §2.1/§2.9).
  *
  * q_pruned_scan: writes the events cube Parquet-partitioned by
  * (p_date, p_block), then answers a bbox+time query through the pruned
  * layout — same answer as the raw scan, but the plan touches only the
  * intersecting partition directories (PartitionFilters).
  *
  * q_stream_window: genuine Structured Streaming — file source over the
  * events parquet, 1-day event-time windows with a watermark, AvailableNow
  * trigger into a memory sink; the converged result equals the batch
  * day-bucket aggregation, which is what the DuckDB oracle checks.
  */
object StoragePack extends QueryPack {

  private val queryCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_pruned_scan" -> ((s, d) => {
      val cube0 = CubePack.eventsCube(s, d)
      // 64x64 tiles → 6x2 blocks on the 360x100 grid
      val gm = cube0.gm.copy(tileWidth = 64, tileHeight = 64)
      val cube = cube0.copy(gm = gm)
      val sfName = new java.io.File(d).getName
      val path = s"/root/repo/target/cube_parts_$sfName"
      CubeWriter.writePartitioned(cube, path)
      CubeWriter.prunedScan(s, path, gm,
          bbox = Some((30.0, 10.0, 99.0, 49.0)),
          dateRange = Some(("2024-01-05", "2024-01-14")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 6).as("sum_v"))
    }),

    "q_stream_window" -> ((s, d) => {
      val schema = GraftSession.table(s, d, "events").schema
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 day")
      val agg = stream
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
        .select(col("window.start").as("t"), col("event_type"), col("n"), col("sum_value"))
      val tbl = s"q_stream_window_${queryCounter.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(tbl)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(tbl)
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_pruned_scan" ->
      s"""WITH ${CubePack.cubeCte}
         SELECT event_type, count(*) AS n, round(sum(v), 6) AS sum_v
         FROM cube
         WHERE x BETWEEN 30.0 AND 99.0 AND y BETWEEN 10.0 AND 49.0
           AND CAST(time AS DATE) >= DATE '2024-01-05'
           AND CAST(time AS DATE) <= DATE '2024-01-14'
         GROUP BY event_type""",
    "q_stream_window" ->
      """SELECT date_trunc('day', ts) AS t, event_type,
                count(*) AS n, round(sum(value), 6) AS sum_value
         FROM events GROUP BY t, event_type"""
  )
}
