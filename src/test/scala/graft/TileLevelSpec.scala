package graft

import graft.cube.{Cube, GridMapping, TilingScheme}
import graft.operators.TileOps
import graft.sources.LevelStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.Timestamp

class TileLevelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("LevelStore: progressive 2x2-mean pyramid, read-back, level pick") {
    import spark.implicits._
    val gm = GridMapping(8, 8, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 8; i <- 0 until 8)
      yield (t0, j + 0.5, i + 0.5, 1.0)
    val cube = Cube(rows.toDF("time", "y", "x", "v"), gm)
    val base = new java.io.File("/root/repo/target/tmp-tests")
    base.mkdirs()
    val root = Files.createTempDirectory(base.toPath, "levels").toString
    val gms = LevelStore.writeLevels(cube, root, 2)
    assert(gms.map(_.width) == Seq(8L, 4L, 2L))
    assert(LevelStore.listLevels(spark, root) == Seq(0, 1, 2))
    val l1 = LevelStore.openLevel(spark, root, 1)
    assert(l1.count() == 16)
    assert(l1.agg(min("v"), max("v")).head() ==
      org.apache.spark.sql.Row(1.0, 1.0)) // mean of constant field
    // level pick: res 2.0 → level 1; res 1.5 → level 0; res 100 → coarsest
    assert(LevelStore.levelForResolution(gms, 2.0) == 1)
    assert(LevelStore.levelForResolution(gms, 1.5) == 0)
    assert(LevelStore.levelForResolution(gms, 100.0) == 2)
  }

  test("level-for-resolution advances only when BOTH axes exceed the ask") {
    // the reference rule (mldataset/abc.py:136-149): a level is passed
    // over only when x_res AND y_res both exceed the request — an x-only
    // test resolves anisotropic pyramids one level too coarse
    val rs = Seq((1.0, 0.5), (2.0, 1.0), (4.0, 2.0), (8.0, 4.0))
    assert(LevelStore.levelForResolutionXY(rs, 2.5) == 2) // L2 has yRes 2 <= 2.5
    assert(LevelStore.levelForResolutionXY(rs, 0.4) == 0) // even L0 exceeds: clamp
    assert(LevelStore.levelForResolutionXY(rs, 4.0) == 3) // L3 yRes == 4: kept
    assert(LevelStore.levelForResolutionXY(rs, 100.0) == 3)
  }

  test("computeTile gathers a dense top-row-first tile with NaN holes") {
    import spark.implicits._
    val gm = GridMapping(4, 4, 0.0, 0.0, 1.0, 1.0)
    // value = i + 10*j; omit cell (1,1) to create a hole
    val rows = for (j <- 0 until 4; i <- 0 until 4; if !(i == 1 && j == 1))
      yield (i + 0.5, j + 0.5, (i + 10 * j).toDouble)
    val df = rows.toDF("x", "y", "v")
    val scheme = TilingScheme(1, 1, "local", 0.0, 0.0, 4.0, 4.0, tileSize = 4)
    val tile = TileOps.computeTile(df, gm, scheme, 0, 0, 0, "v")
    assert(tile.length == 16)
    // top row (y=3.5, j=3): 30, 31, 32, 33
    assert(tile.slice(0, 4).toSeq == Seq(30.0, 31.0, 32.0, 33.0))
    // bottom row (j=0): 0..3
    assert(tile.slice(12, 16).toSeq == Seq(0.0, 1.0, 2.0, 3.0))
    // the hole: j=1 → py=2, i=1 → px=1
    assert(tile(2 * 4 + 1).isNaN)
  }

  test("ComputedLevels: lazy memoized per-level views") {
    import spark.implicits._
    var calls = 0
    val gm = GridMapping(8, 8, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 8; i <- 0 until 8)
      yield (t0, j + 0.5, i + 0.5, 1.0)
    val base = Cube(rows.toDF("time", "y", "x", "v"), gm)
    val ml = new graft.sources.ComputedLevels(base, 2, (c, l) => {
      calls += 1
      graft.operators.SubsampleOps.decimate(c, l)
    })
    assert(ml.numLevels == 3)
    assert(ml.level(0).gm.width == 8)
    assert(ml.level(2).df.count() == 4)
    ml.level(2) // memoized
    assert(calls == 1)
    assert(ml.levelForResolution(2.0) == 1)
    intercept[IllegalArgumentException](ml.level(5))
  }

  test("computeCubeAttrs recomputes CF coverage attributes") {
    import spark.implicits._
    val gm = GridMapping(4, 4, 0.0, 0.0, 1.0, 1.0)
    val cube = Cube(Seq(
      (t0, 0.5, 0.5, 1.0),
      (Timestamp.valueOf("2024-01-03 00:00:00"), 2.5, 3.5, 2.0)
    ).toDF("time", "y", "x", "v"), gm)
    val attrs = graft.operators.MaintenanceOps.computeCubeAttrs(cube)
    assert(attrs("geospatial_lon_min") == "0.5" && attrs("geospatial_lon_max") == "3.5")
    assert(attrs("time_coverage_start") == "2024-01-01T00:00:00Z")
    assert(attrs("geospatial_lat_resolution") == "1.0")
  }
}
