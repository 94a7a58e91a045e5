package graft

import graft.cube.{Cube, GridMapping}
import graft.sources.CubeWriter
import graft.streaming.TimeSliceOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

class StorageStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private val gm = GridMapping(100, 100, 0.0, 0.0, 1.0, 1.0,
    tileWidth = 50, tileHeight = 50)

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkCube(day: String, v: Double): Cube = {
    import spark.implicits._
    val t = ts(s"$day 00:00:00")
    val rows = for (j <- 0 until 10; i <- 0 until 10)
      yield (t, j * 10 + 0.5, i * 10 + 0.5, v)
    Cube(rows.toDF("time", "y", "x", "v"), gm)
  }

  private def tmpDir(prefix: String): String = {
    val base = new java.io.File("/root/repo/target/tmp-tests")
    base.mkdirs()
    Files.createTempDirectory(base.toPath, prefix).toString
  }

  test("partitioned write + pruned scan: partition filters, same answer") {
    val path = tmpDir("cube")
    CubeWriter.writePartitioned(mkCube("2024-01-01", 1.0), path)
    TimeSliceOps.appendTimeSlice(mkCube("2024-01-02", 2.0), path)
    val pruned = CubeWriter.prunedScan(spark, path, gm,
      bbox = Some((0.0, 0.0, 49.0, 49.0)),
      dateRange = Some(("2024-01-02", "2024-01-02")))
    // 5x5 cells in the lower-left 50x50 block, day 2 only
    assert(pruned.count() == 25)
    assert(pruned.agg(sum("v")).head().getDouble(0) == 50.0)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("p_block"),
      s"partition pruning missing in plan:\n$scan")
  }

  test("replaceTimeSlice overwrites only its own partitions (late slice)") {
    val path = tmpDir("cube")
    CubeWriter.writePartitioned(mkCube("2024-01-01", 1.0), path)
    TimeSliceOps.appendTimeSlice(mkCube("2024-01-02", 2.0), path)
    // late corrected slice for day 1
    TimeSliceOps.replaceTimeSlice(mkCube("2024-01-01", 9.0), path)
    val byDay = spark.read.parquet(path).groupBy("p_date")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> (r.getDouble(1), r.getLong(2))).toMap
    assert(byDay("2024-01-01") == ((900.0, 100L))) // replaced, not duplicated
    assert(byDay("2024-01-02") == ((200.0, 100L))) // untouched
  }

  test("findTimeSlice classifies append/insert/replace") {
    import spark.implicits._
    val df = Seq(ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
      .toDF("time")
    assert(TimeSliceOps.findTimeSlice(df, "time", ts("2024-01-05 00:00:00")) == TimeSliceOps.Append)
    assert(TimeSliceOps.findTimeSlice(df, "time", ts("2024-01-02 00:00:00")) == TimeSliceOps.Insert)
    assert(TimeSliceOps.findTimeSlice(df, "time", ts("2024-01-03 00:00:00")) == TimeSliceOps.Replace)
  }

  test("streamUpsert ingests late slices as partition overwrites") {
    val src = tmpDir("src")
    val dest = tmpDir("dest")
    val schema = mkCube("2024-01-01", 1.0).df.schema
    def runOnePass(): Unit = {
      val q = TimeSliceOps.streamUpsert(spark, schema, src, dest,
        batch => Cube(batch, gm))
      q.awaitTermination()
    }
    mkCube("2024-01-01", 1.0).df.write.parquet(s"$src/slice1")
    runOnePass()
    val first = spark.read.parquet(dest)
    assert(first.count() == 100 && first.agg(sum("v")).head().getDouble(0) == 100.0)
    // a late corrected slice for the same day arrives → upsert, not append
    mkCube("2024-01-01", 5.0).df.write.parquet(s"$src/slice2")
    runOnePass()
    val second = spark.read.parquet(dest)
    assert(second.count() == 100 && second.agg(sum("v")).head().getDouble(0) == 500.0)
  }
}
