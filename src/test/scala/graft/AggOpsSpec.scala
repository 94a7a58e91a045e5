package graft

import graft.cube.{Cube, GridMapping}
import graft.operators.{StatsOps, SubsampleOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AggOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("mode Aggregator: most frequent wins, ties break to smallest, NaN skipped") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 2.0, 3.0, 3.0, Double.NaN).toDF("v")
    val m = df.agg(SubsampleOps.modeAgg(col("v")).as("m")).head().getDouble(0)
    assert(m == 2.0) // 2 and 3 both appear twice → smallest wins
  }

  test("subsample: 2x2 block mean + mode on a 4x4 grid") {
    import spark.implicits._
    val gm = GridMapping(4, 4, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 4; i <- 0 until 4)
      yield (t0, j + 0.5, i + 0.5, (j * 4 + i).toDouble, (i / 2).toDouble)
    val cube = Cube(rows.toDF("time", "y", "x", "v", "cls"), gm)
    val (out, gm2) = SubsampleOps.subsample(cube, 2,
      Seq("v" -> "mean", "cls" -> "mode", "v" -> "first"))
    assert(gm2.width == 2 && gm2.xRes == 2.0)
    val got = out.collect().map(r =>
      (r.getAs[Long]("block_j"), r.getAs[Long]("block_i")) ->
        (r.getAs[Double]("v_mean"), r.getAs[Double]("cls_mode"), r.getAs[Double]("v_first"))).toMap
    // block (0,0): cells v = 0,1,4,5 → mean 2.5; cls all 0; first (row-major) = 0
    assert(got((0L, 0L)) == ((2.5, 0.0, 0.0)))
    // block (1,1): cells v = 10,11,14,15 → mean 12.5; cls = 1
    assert(got((1L, 1L)) == ((12.5, 1.0, 10.0)))
  }

  test("decimate keeps every 2^l-th cell with level grid mapping") {
    import spark.implicits._
    val gm = GridMapping(4, 4, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 4; i <- 0 until 4)
      yield (t0, j + 0.5, i + 0.5, 1.0)
    val cube = Cube(rows.toDF("time", "y", "x", "v"), gm)
    val l1 = SubsampleOps.decimate(cube, 1)
    assert(l1.df.count() == 4) // cells (0,0),(0,2),(2,0),(2,2)
    assert(l1.gm.width == 2 && l1.gm.xRes == 2.0)
  }

  test("histogram: dense buckets, correct counts and density") {
    import spark.implicits._
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val h = StatsOps.histogram(df, "v", 10).collect()
    assert(h.length == 10)
    assert(h.forall(_.getAs[Long]("n") == 10L))
    // density sums to ~1/binW consistency: n/(100 * 9.9) each
    val d = h.head.getAs[Double]("density")
    assert(math.abs(d - 10.0 / (100.0 * 9.9)) < 1e-6)
    val empty = StatsOps.histogram(df.filter(col("v") < 45.0), "v", 10)
      .filter(col("n") === 0).count()
    assert(empty == 0L) // 0..44 spread over 10 bins of width 4.4: none empty
  }

  test("autoMethods: int/bool -> first, float -> mean (subsampling.py:210)") {
    import spark.implicits._
    val gm = GridMapping(4, 4, 0.0, 0.0, 1.0, 1.0)
    val df = Seq((t0, 0.5, 0.5, 1.0, 2L, true, "label"))
      .toDF("time", "y", "x", "f", "i", "b", "s")
    val m = SubsampleOps.autoMethods(Cube(df, gm)).toMap
    assert(m == Map("f" -> "mean", "i" -> "first", "b" -> "first"))
  }

  test("VolumeOps.brick decimates to the voxel budget and fills NaN holes") {
    import spark.implicits._
    val gm = GridMapping(8, 8, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 8; i <- 0 until 8)
      yield (t0, j + 0.5, i + 0.5, (j * 8 + i).toDouble)
    val cube = Cube(rows.toDF("time", "y", "x", "v"), gm)
    val b = graft.operators.VolumeOps.brick(cube, "v",
      0.0, 0.0, 7.9, 7.9, Seq(t0), maxVoxels = 20)
    assert(b.stride == 2 && b.nx == 4 && b.ny == 4 && b.nt == 1)
    assert(b.values.length == 16)
    assert(b.values(0) == 0.0 && b.values(5) == 18.0) // cell (2,2)
    val full = graft.operators.VolumeOps.brick(cube, "v",
      0.0, 0.0, 7.9, 7.9, Seq(t0), maxVoxels = 100)
    assert(full.stride == 1 && full.values.count(_.isNaN) == 0)
  }
}
