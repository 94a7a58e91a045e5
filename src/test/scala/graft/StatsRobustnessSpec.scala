package graft

import graft.operators.{StatsOps, TemporalOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fold-path vs row-path agreement on the degenerate shapes the fixtures
  * used to avoid: empty / all-NaN input, single-value groups, constant
  * groups at 1e±300, spread across ±1e300, zero-width histograms — the
  * round-15 verdict's "mirror the 6b82367 robustness fix into
  * StatsOps.statisticsFold/statisticsFoldBy and guard histogramFold"
  * item, pinned as a spec. */
class StatsRobustnessSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  /** Null/NaN-aware 6-decimal canonical rows, sorted. */
  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map {
      case null => "null"
      case d: Double => if (d.isNaN) "NaN" else f"$d%.6f"
      case o => o.toString
    }).sortBy(_.mkString("|")).map(_.toSeq).toSeq

  private def checkFoldVsRow(vals: Seq[Double]): Unit = {
    val df = vals.toDF("v")
    val fold = StatsOps.statisticsFold(df, "v")
    val row = StatsOps.statistics(df, "v")
    assert(canon(fold) === canon(row), s"values: $vals")
  }

  test("statisticsFold matches statistics on degenerate sizes") {
    checkFoldVsRow(Nil) // n = 0: null extremes, null mean/std
    checkFoldVsRow(Seq(Double.NaN, Double.NaN)) // all-NaN == n = 0
    checkFoldVsRow(Seq(42.5)) // n = 1: null std (Spark's var_samp rule)
    checkFoldVsRow(Seq(7.25, Double.NaN)) // one valid value among NaN
  }

  test("statisticsFold matches statistics at 1e±300 magnitudes") {
    // |v| beyond ~1e154 overflows the second moment on BOTH paths —
    // Spark's own stddev_samp reads NaN there (probed), and the fold's
    // overflow guard maps its non-finite raw moment to the same NaN
    checkFoldVsRow(Seq.fill(5)(1e300))
    checkFoldVsRow(Seq.fill(5)(-1e300))
    checkFoldVsRow(Seq(1e300, -1e300))
    checkFoldVsRow(Seq.fill(3)(1e-300)) // squares underflow: clamp to 0
    checkFoldVsRow(Seq(1e-300, 2e-300, Double.NaN))
    // large magnitude, low spread: the cancellation clamp's own
    // guarantee is "never sqrt(-ε) = NaN", not row-path accuracy — the
    // one-pass residue at mean ~1e15 swamps the true 0.00195 variance
    val lowSpread = (Seq.fill(4)(1.0e15) ++ Seq(1.0e15 + 0.125)).toDF("v")
    val std = StatsOps.statisticsFold(lowSpread, "v")
      .head().getDouble(4)
    assert(!std.isNaN && std >= 0.0)
  }

  test("statisticsFoldBy matches statisticsBy over mixed degenerate groups") {
    val df = Seq(
      ("a", 1.0), // n = 1
      ("b", Double.NaN), ("b", Double.NaN), // all-NaN group
      ("c", 1e300), ("c", 1e300), ("c", 1e300), // constant huge
      ("d", 3.5), ("d", 4.5), ("d", Double.NaN), // ordinary + NaN hole
      ("e", 1e-300), ("e", 1e-300) // constant tiny
    ).toDF("k", "v")
    assert(canon(StatsOps.statisticsFoldBy(df, "v", Seq("k"))) ===
      canon(StatsOps.statisticsBy(df, "v", Seq("k"))))
  }

  test("histogram paths survive empty / all-NaN / constant input") {
    val empty = Seq.empty[Double].toDF("v")
    assert(StatsOps.histogramFold(empty, "v", 8).count() === 0)
    assert(StatsOps.histogram(empty, "v", 8).count() === 0)
    val allNaN = Seq(Double.NaN, Double.NaN).toDF("v")
    assert(StatsOps.histogramFold(allNaN, "v", 8).count() === 0)
    assert(StatsOps.histogram(allNaN, "v", 8).count() === 0)
    // constant input: np.histogram's [v − 0.5, v + 0.5] expansion — all
    // mass in the middle bucket, density finite, fold == row path
    val const = Seq.fill(6)(5.0).toDF("v")
    val f = StatsOps.histogramFold(const, "v", 4)
    assert(canon(f) === canon(StatsOps.histogram(const, "v", 4)))
    val mid = f.filter(col("bucket") === 2).head()
    assert(mid.getLong(1) === 6L && !mid.getDouble(2).isNaN)
  }

  test("resample std/var fold pieces agree with methodAgg on degenerates") {
    // bucket 0: one value; bucket 1: constant 1e300; bucket 2: all-NaN;
    // bucket 3: ordinary dyadic pair (t counts days, 2D buckets)
    val df = Seq(
      (0.0, 3.25), (2.0, 1e300), (3.0, 1e300),
      (4.0, Double.NaN), (5.0, Double.NaN), (6.0, 1.5), (7.0, 3.5)
    ).toDF("t", "v")
    val fold = TemporalOps.resampleInTimeNumeric(
      df, "t", 86400.0, "2D", Seq("v" -> "std", "v" -> "var"))
    val rows = df.withColumn("ts", timestamp_seconds(col("t") * 86400.0))
    val truth = TemporalOps.resampleInTime(
      rows, "ts", "2D", Seq("v" -> "std", "v" -> "var"))
    assert(canon(fold) === canon(truth))
  }

  test("seeded random dyadic groups: fold == row path bit-stable at 6dp") {
    val rnd = new scala.util.Random(20260815L)
    val data = (0 until 400).map { i =>
      (s"g${i % 13}", math.floor(rnd.nextDouble() * 4096) / 64.0)
    }.toDF("k", "v")
    assert(canon(StatsOps.statisticsFoldBy(data, "v", Seq("k"))) ===
      canon(StatsOps.statisticsBy(data, "v", Seq("k"))))
  }
}
