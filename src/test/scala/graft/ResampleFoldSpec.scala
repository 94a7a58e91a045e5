package graft

import graft.sources.ZarrSource
import graft.sources.zarr.ChunkStats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The last resample_in_time methods re-expressed connector-first:
  * std/var as pushed moment partials, any/all as pushed square
  * extremes, first/last as a cross-guarded time fold + slice gather,
  * argmax/argmin as an extreme fold + value-predicate gather. Each is
  * pinned against the row-path methodAgg semantics. */
class ResampleFoldSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("4").getOrCreate()
    s.conf.set("spark.sql.files.minPartitionNum", "100000")
    s
  }

  private def tmpDir(prefix: String): String = {
    val base = new java.io.File("/root/repo/target/tmp-tests")
    base.mkdirs()
    Files.createTempDirectory(base.toPath, prefix).toString
  }

  /** 4×4×6 cube, 1×2×3 chunks → 16 chunks; t in days. v dyadic with a
    * planted per-bucket max; w has NaN on its FIRST time slice so
    * first/last must skip to a later valid slice. */
  private def writeFixture(): String = {
    import spark.implicits._
    val t = Array(0.0, 1.0, 2.0, 3.0)
    val y = Array(10.0, 20.0, 30.0, 40.0)
    val x = Array.tabulate(6)(_ + 0.5)
    val df = (for { ti <- t; yi <- y; xi <- x } yield
      (ti, yi, xi,
        (ti * 64 + yi + xi * 4) / 4.0,
        if (ti == 0.0) Double.NaN
        else if (xi == 2.5) 0.0 else ti * 8 + yi / 2 + xi))
      .toSeq.toDF("t", "y", "x", "v", "w")
    val g = s"${tmpDir("rsfold")}/cube.zarr"
    ZarrSource.writeCubeVars(df, g, Seq("v", "w"),
      Seq("t" -> t, "y" -> y, "x" -> x), chunks = Seq(1, 2, 3))
    g
  }

  import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case b: BatchScanExec => b }.get

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case d: Double => f"$d%.6f"
      case ts: java.sql.Timestamp => ts.toString
      case o => o
    }).sortBy(_.mkString("|")).map(_.toSeq).toSeq

  test("std/var/any/all fold from the connector and match methodAgg") {
    val g = writeFixture()
    val zc = spark.read.format("zarr").load(g)
    val q = graft.operators.TemporalOps.resampleInTimeNumeric(
      zc, "t", 86400.0, "2D",
      Seq("v" -> "std", "v" -> "var", "v" -> "any", "w" -> "all"))
    assert(q.queryExecution.executedPlan.toString.contains("ZarrVarAggScan"),
      q.queryExecution.executedPlan.toString.take(1200))
    // row-path truth through methodAgg over real timestamps
    val rows = ZarrSource.readCubeVars(spark, g, Seq("v", "w"))
      .withColumn("ts", timestamp_seconds(col("t") * 86400.0))
    val truth = graft.operators.TemporalOps.resampleInTime(
      rows, "ts", "2D",
      Seq("v" -> "std", "v" -> "var", "v" -> "any", "w" -> "all"))
    assert(sortedRows(q) === sortedRows(truth))
  }

  test("first/last fold: cross-guarded time partial + pruned slice gather") {
    val g = writeFixture()
    val zc = spark.read.format("zarr").load(g)
    val q = graft.operators.TemporalOps.resampleFirstLastFold(
      zc, "t", 86400.0, "2D", Seq("v", "w"), last = false,
      extraKeys = Seq("y", "x"))
    // one-pass row-path truth: the same min_by/max_by semantics without
    // the two-phase gather
    val rows = ZarrSource.readCubeVars(spark, g, Seq("v", "w"))
    val truth = graft.operators.TemporalOps.resampleInTimeNumeric(
      rows, "t", 86400.0, "2D", Seq("v" -> "first", "w" -> "first"),
      extraKeys = Seq("y", "x"))
    assert(sortedRows(q) === sortedRows(truth))
    // last over the NaN-leading w picks the valid trailing slice
    val ql = graft.operators.TemporalOps.resampleFirstLastFold(
      zc, "t", 86400.0, "1M", Seq("w"), last = true,
      extraKeys = Seq("y", "x"))
    val truthL = graft.operators.TemporalOps.resampleInTimeNumeric(
      rows, "t", 86400.0, "1M", Seq("w" -> "last"),
      extraKeys = Seq("y", "x"))
    assert(sortedRows(ql) === sortedRows(truthL))
    // the cross-guard partial itself folds per chunk
    val p1 = zc.groupBy(floor(col("t") / 2.0).as("b"))
      .agg(min(when(col("w").cast("double") <= lit(Double.PositiveInfinity),
        col("t"))).as("ft"))
    assert(p1.queryExecution.executedPlan.toString.contains("ZarrVarAggScan"))
    val got = p1.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(0L -> 1.0, 1L -> 2.0)) // t=0 slice is all-NaN w
  }

  test("argmax fold: extreme partial + value-gathered finish, sidecar-pruned") {
    val g = writeFixture()
    ChunkStats.analyze(spark, g)
    val zc = spark.read.format("zarr").load(g)
    val q = graft.operators.TemporalOps.resampleArgFold(
      zc, "t", 86400.0, "2D", "v", argmax = true, extraKeys = Seq("y"))
    val rows = ZarrSource.readCubeVars(spark, g, Seq("v", "w"))
    val truth = graft.operators.TemporalOps.resampleInTimeNumeric(
      rows, "t", 86400.0, "2D", Seq("v" -> "argmax"), extraKeys = Seq("y"))
    assert(sortedRows(q) === sortedRows(truth))
    // phase 2 gathers with a consumed value predicate the sidecar prunes:
    // per (bucket, y) maxima all live at the last t of each bucket and
    // the top x-chunk — the candidate scan plans a strict chunk subset
    val exts = zc.groupBy(floor(col("t") / 2.0).as("b"), col("y"))
      .agg(max(when(col("v").cast("double") <= lit(Double.PositiveInfinity),
        col("v").cast("double"))).as("m"))
      .collect().map(_.getDouble(2)).distinct.toSeq
    val cand = zc.filter(col("v").isin(exts: _*))
    assert(scanOf(cand).inputRDD.getNumPartitions < 16)
    // argmin twin
    val qn = graft.operators.TemporalOps.resampleArgFold(
      zc, "t", 86400.0, "1M", "v", argmax = false)
    val truthN = graft.operators.TemporalOps.resampleInTimeNumeric(
      rows, "t", 86400.0, "1M", Seq("v" -> "argmin"))
    assert(sortedRows(qn) === sortedRows(truthN))
  }
}
