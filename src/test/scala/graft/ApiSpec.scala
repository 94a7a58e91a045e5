package graft

import graft.api.{Graft, OperationRegistry, syntax}
import graft.cube.{Cube, GridMapping}
import graft.operators.{TemporalOps, TileOps, TimeSeriesOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class ApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def cube(): Cube = {
    import spark.implicits._
    val gm = GridMapping(10, 10, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 10; i <- 0 until 10)
      yield (t0, j + 0.5, i + 0.5, (i + j).toDouble)
    Cube(rows.toDF("time", "y", "x", "v"), gm)
  }

  test("fluent cube API chains subset → mask → timeSeries") {
    import syntax._
    val series = cube()
      .spatialSubset(0.0, 0.0, 5.0, 5.0)
      .maskByGeometry("POLYGON ((0 0, 10 0, 0 10, 0 0))")
      .timeSeries("v", methods = Seq("mean", "count"))
      .collect()
    assert(series.length == 1)
    assert(series.head.getAs[Long]("v_count") > 0)
  }

  test("fluent extra-dim surface: statisticsBy, selNearest, per-label series") {
    import syntax._
    import spark.implicits._
    val gm = GridMapping(4, 4, 0.0, 0.0, 1.0, 1.0)
    val rows = for (j <- 0 until 4; i <- 0 until 4; depth <- Seq(0.0, 10.0))
      yield (t0, j + 0.5, i + 0.5, depth, depth + i + j)
    val c = Cube(rows.toDF("time", "y", "x", "depth", "v"), gm)
    val stats = c.statisticsBy("v", "depth").collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(stats == Map(0.0 -> 16L, 10.0 -> 16L))
    assert(c.selNearest("depth", 7.0).df
      .select("depth").distinct().collect().map(_.getDouble(0)).toSeq == Seq(10.0))
    val series = c.timeSeries("v", extraDims = Seq("depth")).collect()
    assert(series.length == 2)
  }

  test("fluent zonalStatistics: per-zone stats through the rasterizer") {
    import syntax._
    import spark.implicits._
    // two rectangular zones splitting the 10x10 grid at x=5
    val zones = Seq(
      ("POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))", 0.0),
      ("POLYGON ((5 0, 10 0, 10 10, 5 10, 5 0))", 1.0)
    ).toDF("geometry", "zone")
    val stats = cube().zonalStatistics(zones, "geometry", "zone", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // v = i + j: left zone i in [0,5) -> min 0 (0+0), max 13 (4+9)
    assert(stats(0L) == ((50L, 0.0, 13.0)), stats(0L).toString)
    assert(stats(1L) == ((50L, 5.0, 18.0)), stats(1L).toString)
  }

  test("operation registry: lookup + apply + rejection") {
    val half = OperationRegistry("spatial_subset", cube())
    assert(half.df.count() == 25) // quarter of the 10x10 grid
    assert(OperationRegistry.names.contains("identity"))
    OperationRegistry.register("double_v")(c => c.withDf(_.withColumn("v", col("v") * 2)))
    val doubled = OperationRegistry("double_v", cube())
    assert(doubled.df.agg(max("v")).head().getDouble(0) == 36.0)
    intercept[NoSuchElementException](OperationRegistry("nope", cube()))
  }

  test("maxValids keeps N most recent per key") {
    import spark.implicits._
    val df = (1 to 10).map(i =>
      ("k", Timestamp.valueOf(f"2024-01-$i%02d 00:00:00"), i.toDouble, i.toLong))
      .toDF("k", "ts", "v", "id")
    val out = TemporalOps.maxValids(df, Seq("k"), "ts", col("v") > 2.0, 3, "id")
    assert(out.select("v").collect().map(_.getDouble(0)).sorted.toSeq == Seq(8.0, 9.0, 10.0))
  }

  test("mergeSeries aligns series on time") {
    import spark.implicits._
    val a = Seq((t0, 1.0)).toDF("time", "m1")
    val b = Seq((t0, 2.0)).toDF("time", "m2")
    val m = TimeSeriesOps.mergeSeries(Seq(a, b))
    assert(m.columns.toSeq == Seq("time", "m1", "m2"))
    assert(m.head().getDouble(2) == 2.0)
  }

  test("GraftExtensions: custom expressions callable from SQL") {
    val one = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(2.0D, 0.0D)) AS c").head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val fps = spark.sql(
      "SELECT size(winnow_fp('the quick brown fox jumps over it', 8, 4)) AS n")
      .head().getInt(0)
    assert(fps > 0)
    val in = spark.sql(
      "SELECT point_covered_by(0.5D, 0.5D, 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))') AS b")
      .head().getBoolean(0)
    assert(in)
    // non-literal wkt rejected with a clear message
    intercept[Exception] {
      spark.sql("SELECT point_covered_by(0.5D, 0.5D, repeat('x', 2))").collect()
    }
  }

  test("driver contract: entry returns rows; queries and oracles align") {
    assert(SparkEntry.entry(spark).count() > 0)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.subsetOf(o), s"queries without oracle SQL (weaker rows-only check): ${q -- o}")
  }

  test("renderRgba: gray ramp, NaN transparent") {
    val px = TileOps.renderRgba(Array(0.0, 5.0, 10.0, Double.NaN), 0.0, 10.0,
      cmapName = "gray")
    assert(px(0) == 0xff000000)
    assert(px(1) == 0xff7f7f7f || px(1) == 0xff808080)
    assert(px(2) == 0xffffffff)
    assert(px(3) == 0)
  }

  test("colormap families: exact RGBA at stops, reversal, alpha, categorical") {
    import graft.functions.Colormaps
    val v = Colormaps.get("viridis")
    assert(v.argb(0.0) == 0xff440154)          // anchor colors exact
    assert(v.argb(1.0) == 0xfffde725)
    assert(v.argb(0.5) == 0xff21918c)
    // midpoint between anchors 0 and 0.25 lerps channel-wise
    val mid = v.argb(0.125)
    def ch(c: Int, s: Int) = (c >> s) & 0xff
    assert(ch(mid, 16) == math.round((0x44 + 0x3b) / 2.0).toInt)
    assert(Colormaps.get("plasma").argb(0.0) == 0xff0d0887)
    assert(Colormaps.get("inferno").argb(1.0) == 0xfffcffa4)
    assert(Colormaps.get("magma").argb(0.0) == 0xff000004)
    // reversed variant mirrors the ends
    assert(Colormaps.get("viridis_r").argb(0.0) == 0xfffde725)
    assert(Colormaps.get("viridis_r").argb(1.0) == 0xff440154)
    // alpha ramp fades small values, keeps large opaque
    assert((Colormaps.get("viridis_alpha").argb(0.0) >>> 24) == 0)
    assert((Colormaps.get("viridis_alpha").argb(1.0) >>> 24) == 0xff)
    // categorical picks bins without interpolation
    val t = Colormaps.get("tab10")
    assert(t.argb(0.0) == 0xff1f77b4)
    assert(t.argb(0.05) == 0xff1f77b4)
    assert(t.argb(0.15) == 0xffff7f0e)
    assert(t.argb(1.0) == 0xff17becf)
    // NaN transparent; unknown name falls back to the default family
    assert(t.argb(Double.NaN) == 0)
    assert(Colormaps.get("no_such_map").name == "viridis")
    assert(Colormaps.names.contains("RdBu_r"))
    // extended families: exact anchors at the ends
    assert(Colormaps.get("turbo").argb(0.0) == 0xff30123b)
    assert(Colormaps.get("turbo").argb(1.0) == 0xff7a0403)
    assert(Colormaps.get("coolwarm").argb(0.5) == 0xffdddddd)
    assert(Colormaps.get("seismic").argb(0.5) == 0xffffffff)
    assert(Colormaps.get("bwr_r").argb(0.0) == 0xffff0000)
  }

  test("custom colormap JSON codes: continuous and stepwise (cmaps.py:486)") {
    import graft.functions.Colormaps
    val cont = Colormaps.get(
      """{"name":"my_ramp","type":"continuous",
         "colors":[[0,"#000000"],[50,"#808080"],[100,"#ffffff"]]}""")
    assert(cont.name == "my_ramp")
    assert(cont.argb(0.0) == 0xff000000)
    assert(cont.argb(0.5) == 0xff808080)          // value 50 normalized
    assert(cont.argb(1.0) == 0xffffffff)
    // quarter point lerps between black and mid-gray
    assert(((cont.argb(0.25) >> 16) & 0xff) == 0x40)
    val step = Colormaps.get(
      """{"name":"classes","type":"stepwise",
         "colors":[[0,"#ff0000"],[10,"#00ff00"],[20,"#0000ff"]]}""")
    assert(step.argb(0.2) == 0xffff0000)          // holds red until value 10
    assert(step.argb(0.7) == 0xff00ff00)          // green band [10, 20)
    // the last item only closes the final band — its color is unused,
    // matching the reference's stepwise expansion over items[0:-1]
    assert(step.argb(1.0) == 0xff00ff00)
    // unsorted stop values are sorted before normalization — an unsorted
    // code must parse to the same map as its sorted form
    val unsorted = Colormaps.get(
      """{"name":"my_ramp","type":"continuous",
         "colors":[[100,"#ffffff"],[0,"#000000"],[50,"#808080"]]}""")
    assert(unsorted.argb(0.0) == cont.argb(0.0))
    assert(unsorted.argb(0.5) == cont.argb(0.5))
    assert(unsorted.argb(1.0) == cont.argb(1.0))
  }

  test("renderPng produces a decodable PNG with transparency") {
    val png = TileOps.renderPng(Array(0.0, 10.0, Double.NaN, 5.0), 2, 2, 0.0, 10.0,
      cmapName = "gray")
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 2 && img.getHeight == 2)
    assert((img.getRGB(1, 0) & 0xffffff) == 0xffffff) // vmax -> white
    assert((img.getRGB(0, 1) >>> 24) == 0)            // NaN -> transparent
  }

  test("embedding near-dup pairs stay within buckets and above threshold") {
    import spark.implicits._
    val close1 = Array.fill(8)(1.0f)
    val close2 = Array.tabulate(8)(i => if (i == 0) 0.9f else 1.0f)
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((1L, close1), (2L, close2), (3L, far)).toDF("vec_id", "embedding")
    val pairs = graft.operators.EmbeddingOps
      .nearDupPairs(df, "vec_id", "embedding", 8, 4, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // 3 is in another bucket entirely
  }
}
