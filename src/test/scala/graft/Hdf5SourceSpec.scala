package graft

import graft.sources.{Hdf5Source, NetcdfSource}
import graft.sources.NetcdfSource.NcDim
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class Hdf5SourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def tmp(prefix: String): String = {
    val base = new java.io.File("/root/repo/target/tmp-tests")
    base.mkdirs()
    Files.createTempDirectory(base.toPath, prefix).toString
  }

  test("netCDF-4 round-trip: dims via DIMENSION_LIST, chunked deflate+shuffle") {
    val t = Array(0.0, 1.0, 2.0)
    val y = Array(10.0, 20.0)
    val x = Array(0.5, 1.5, 2.5, 3.5)
    val data = Array.tabulate(3 * 2 * 4)(i => i * 1.25 - 3.0)
    val p = s"${tmp("h5")}/cube.nc"
    Hdf5Source.write(p, Seq(NcDim("t", 3), NcDim("y", 2), NcDim("x", 4)),
      Seq("t" -> t, "y" -> y, "x" -> x),
      Seq(("v", Seq("t", "y", "x"), data)),
      chunkOf = Map("v" -> Seq(2, 2, 3))) // ragged edge chunks in t and x
    // routed through NetcdfSource by magic
    val nc = NetcdfSource.read(p)
    assert(nc.dims.map(d => d.name -> d.size).toSet ==
      Set("t" -> 3, "y" -> 2, "x" -> 4))
    val v = nc.varByName("v")
    assert(v.dimIds.map(nc.dims(_).name) == Seq("t", "y", "x"))
    assert(v.data.sameElements(data))
    assert(nc.varByName("t").data.sameElements(t))
    assert(nc.varByName("x").data.sameElements(x))
    // the file actually compresses: deflate leaves it smaller than raw
    assert(Files.size(Paths.get(p)) < 96 + 24 * 8 + 3 * 2 * 4 * 8 + 4096 + 2048)
    // readCube end-to-end (coordinate binding + long format)
    val rows = NetcdfSource.readCube(spark, p, "v").collect()
    assert(rows.length == 24)
    val m = rows.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(m((0.0, 10.0, 0.5)) == -3.0)
    assert(m((2.0, 20.0, 3.5)) == 23 * 1.25 - 3.0)
  }

  test("uncompressed + default single-chunk layout round-trips bit-for-bit") {
    val y = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val vals = Array(1.5, Double.NaN, -2.5, 1e300, -1e-300)
    val p = s"${tmp("h5raw")}/s.nc"
    Hdf5Source.write(p, Seq(NcDim("y", 5)), Seq("y" -> y),
      Seq(("v", Seq("y"), vals)), deflate = false, shuffle = false)
    val v = NetcdfSource.read(p).varByName("v")
    assert(v.data.zip(vals).forall { case (a, b) =>
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b) })
  }

  test("property: random cubes round-trip across chunkings and filters (20 files)") {
    val rnd = new scala.util.Random(77)
    val dir = tmp("h5prop")
    (1 to 20).foreach { i =>
      val ny = 1 + rnd.nextInt(8)
      val nx = 1 + rnd.nextInt(8)
      val y = Array.tabulate(ny)(_ * 2.0)
      val x = Array.tabulate(nx)(_ + 0.25)
      val data = Array.fill(ny * nx)(rnd.nextDouble() * 2000 - 1000)
      val p = s"$dir/f$i.nc"
      Hdf5Source.write(p, Seq(NcDim("y", ny), NcDim("x", nx)),
        Seq("y" -> y, "x" -> x), Seq(("v", Seq("y", "x"), data)),
        chunkOf = Map("v" -> Seq(1 + rnd.nextInt(ny), 1 + rnd.nextInt(nx))),
        deflate = i % 2 == 0, shuffle = i % 4 < 2)
      val nc = NetcdfSource.read(p)
      assert(nc.varByName("v").data.sameElements(data), s"file $i data")
      assert(nc.varByName("y").data.sameElements(y), s"file $i coord")
    }
  }

  test("distributed multi-granule read unions HDF5 files one per task") {
    val dir = tmp("h5many")
    val y = Array(0.0, 1.0)
    (0 until 3).foreach { g =>
      Hdf5Source.write(s"$dir/g$g.nc", Seq(NcDim("y", 2)), Seq("y" -> y),
        Seq(("v", Seq("y"), Array(g * 10.0, g * 10.0 + 1))))
    }
    val df = NetcdfSource.readCubeFiles(spark,
      (0 until 3).map(g => s"$dir/g$g.nc"), "v")
    assert(df.count() == 6)
    assert(df.agg(org.apache.spark.sql.functions.sum("v")).collect()(0).getDouble(0) == 63.0)
  }

  test("kerchunk scanHdf5: refs decode identically to the direct reader") {
    import graft.sources.KerchunkSource
    val t = Array(0.0, 1.0, 2.0)
    val y = Array(1.5, 2.5)
    val data = Array.tabulate(6)(i => i * 3.5 - 2.0)
    val dir = tmp("h5kc")
    val p = s"$dir/g.nc"
    Hdf5Source.write(p, Seq(NcDim("t", 3), NcDim("y", 2)),
      Seq("t" -> t, "y" -> y), Seq(("v", Seq("t", "y"), data)),
      chunkOf = Map("v" -> Seq(2, 2))) // ragged t edge + shuffle+deflate
    val refsPath = s"$dir/g.refs.json"
    Files.writeString(Paths.get(refsPath), KerchunkSource.scanHdf5(p))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val direct = asMap(NetcdfSource.readCube(spark, p, "v"))
    val virt = asMap(KerchunkSource.readCube(spark, refsPath, "v"))
    assert(direct.size == 6 && virt == direct)
    // the refs carry the filter stack, not re-encoded bytes
    val refs = Files.readString(Paths.get(refsPath))
    assert(refs.contains("shuffle") && refs.contains("zlib"))
  }

  test("rejects what it cannot parse, loudly") {
    // valid signature but a superblock version that does not exist
    val fake = new Array[Byte](200)
    Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').copyToArray(fake)
    fake(8) = 4
    val e = intercept[IllegalArgumentException](Hdf5Source.parse(fake))
    assert(e.getMessage.contains("superblock"))
    val junk = "CDFX".getBytes ++ new Array[Byte](100)
    intercept[IllegalArgumentException](NetcdfSource.parse(junk))
  }

  test("libver-latest round-trip: OHDR headers, link groups, fixed-array index") {
    val t = Array(0.0, 1.0, 2.0)
    val y = Array(10.0, 20.0)
    val x = Array(0.5, 1.5, 2.5, 3.5)
    val data = Array.tabulate(3 * 2 * 4)(i => i * 1.25 - 3.0)
    val p = s"${tmp("h5latest")}/cube.nc"
    Hdf5Source.writeLatest(p, Seq(NcDim("t", 3), NcDim("y", 2), NcDim("x", 4)),
      Seq("t" -> t, "y" -> y, "x" -> x),
      Seq(("v", Seq("t", "y", "x"), data)),
      chunkOf = Map("v" -> Seq(2, 2, 3))) // 2x1x2 grid -> fixed array
    val raw = Files.readAllBytes(Paths.get(p))
    assert(raw(8) == 3, "superblock v3")
    val s = new String(raw, "ISO-8859-1")
    assert(s.contains("OHDR") && s.contains("FAHD") && s.contains("FADB"))
    assert(!s.contains("SNOD") && !s.contains("HEAP"), "no old-style group machinery")
    val nc = NetcdfSource.read(p) // routed by the same magic
    assert(nc.dims.map(d => d.name -> d.size).toSet ==
      Set("t" -> 3, "y" -> 2, "x" -> 4))
    val v = nc.varByName("v")
    assert(v.dimIds.map(nc.dims(_).name) == Seq("t", "y", "x"))
    assert(v.data.sameElements(data))
    assert(nc.varByName("x").data.sameElements(x))
  }

  test("libver-latest single-chunk and implicit chunk indexes round-trip") {
    val dir = tmp("h5lidx")
    val y = Array.tabulate(6)(_ * 1.0)
    val x = Array.tabulate(5)(_ * 3.0)
    val data = Array.tabulate(30)(i => math.sin(i.toDouble))
    // default chunking = whole shape -> single-chunk index, filtered
    val p1 = s"$dir/single.nc"
    Hdf5Source.writeLatest(p1, Seq(NcDim("y", 6), NcDim("x", 5)),
      Seq("y" -> y, "x" -> x), Seq(("v", Seq("y", "x"), data)))
    assert(NetcdfSource.read(p1).varByName("v").data.sameElements(data))
    // single chunk, unfiltered
    val p2 = s"$dir/singleraw.nc"
    Hdf5Source.writeLatest(p2, Seq(NcDim("y", 6), NcDim("x", 5)),
      Seq("y" -> y, "x" -> x), Seq(("v", Seq("y", "x"), data)),
      deflate = false, shuffle = false)
    assert(NetcdfSource.read(p2).varByName("v").data.sameElements(data))
    // multi-chunk unfiltered -> implicit index (contiguous chunks)
    val p3 = s"$dir/implicit.nc"
    Hdf5Source.writeLatest(p3, Seq(NcDim("y", 6), NcDim("x", 5)),
      Seq("y" -> y, "x" -> x), Seq(("v", Seq("y", "x"), data)),
      chunkOf = Map("v" -> Seq(4, 2)), deflate = false, shuffle = false)
    assert(NetcdfSource.read(p3).varByName("v").data.sameElements(data))
  }

  test("property: libver-latest random cubes round-trip (20 files)") {
    val rnd = new scala.util.Random(97)
    val dir = tmp("h5lprop")
    (1 to 20).foreach { i =>
      val ny = 1 + rnd.nextInt(8)
      val nx = 1 + rnd.nextInt(8)
      val y = Array.tabulate(ny)(_ * 2.0)
      val x = Array.tabulate(nx)(_ + 0.25)
      val data = Array.fill(ny * nx)(rnd.nextDouble() * 2000 - 1000)
      val p = s"$dir/f$i.nc"
      Hdf5Source.writeLatest(p, Seq(NcDim("y", ny), NcDim("x", nx)),
        Seq("y" -> y, "x" -> x), Seq(("v", Seq("y", "x"), data)),
        chunkOf = Map("v" -> Seq(1 + rnd.nextInt(ny), 1 + rnd.nextInt(nx))),
        deflate = i % 2 == 0, shuffle = i % 4 < 2)
      val nc = NetcdfSource.read(p)
      assert(nc.varByName("v").data.sameElements(data), s"file $i data")
      assert(nc.varByName("y").data.sameElements(y), s"file $i coord")
    }
  }

  test("kerchunk scanHdf5 indexes libver-latest files (v4 chunk indexes)") {
    import graft.sources.KerchunkSource
    val t = Array(0.0, 1.0, 2.0)
    val y = Array(1.5, 2.5)
    val data = Array.tabulate(6)(i => i * 3.5 - 2.0)
    val dir = tmp("h5lkc")
    val p = s"$dir/g.nc"
    Hdf5Source.writeLatest(p, Seq(NcDim("t", 3), NcDim("y", 2)),
      Seq("t" -> t, "y" -> y), Seq(("v", Seq("t", "y"), data)),
      chunkOf = Map("v" -> Seq(2, 2))) // fixed-array index, shuffle+deflate
    val refsPath = s"$dir/g.refs.json"
    Files.writeString(Paths.get(refsPath), KerchunkSource.scanHdf5(p))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val direct = asMap(NetcdfSource.readCube(spark, p, "v"))
    val virt = asMap(KerchunkSource.readCube(spark, refsPath, "v"))
    assert(direct.size == 6 && virt == direct)
  }

  test("libver-latest DENSE group: >8 links go through fractal heap + v2 B-tree") {
    val dir = tmp("h5dense")
    val p = s"$dir/many.nc"
    val y = Array.tabulate(4)(_ * 1.0)
    // 1 coord + 11 data vars = 12 links -> dense storage (compact max is 8)
    val dataVars = (0 until 11).map { k =>
      (s"v$k", Seq("y"), Array.tabulate(4)(i => k * 100.0 + i))
    }
    Hdf5Source.writeLatest(p, Seq(NcDim("y", 4)), Seq("y" -> y), dataVars)
    val raw = Files.readAllBytes(Paths.get(p))
    val s = new String(raw, "ISO-8859-1")
    assert(s.contains("FRHP") && s.contains("FHDB") &&
      s.contains("BTHD") && s.contains("BTLF"), "dense machinery present")
    val nc = NetcdfSource.read(p)
    assert(nc.vars.map(_.name).toSet ==
      (Set("y") ++ (0 until 11).map(k => s"v$k")))
    (0 until 11).foreach { k =>
      assert(nc.varByName(s"v$k").data.sameElements(
        Array.tabulate(4)(i => k * 100.0 + i)), s"v$k")
    }
    assert(nc.varByName("y").data.sameElements(y))
    // compact still used at <= 8 links (no heap machinery)
    val p2 = s"$dir/few.nc"
    Hdf5Source.writeLatest(p2, Seq(NcDim("y", 4)), Seq("y" -> y),
      dataVars.take(3))
    assert(!new String(Files.readAllBytes(Paths.get(p2)), "ISO-8859-1")
      .contains("FRHP"))
    // deeper into dense territory: 40 variables, varied name lengths
    val p3 = s"$dir/forty.nc"
    val many = (0 until 39).map { k =>
      (s"variable_name_$k", Seq("y"), Array.tabulate(4)(i => k * 7.0 + i))
    }
    Hdf5Source.writeLatest(p3, Seq(NcDim("y", 4)), Seq("y" -> y), many)
    val nc3 = NetcdfSource.read(p3)
    assert(nc3.vars.length == 40)
    (0 until 39).foreach { k =>
      assert(nc3.varByName(s"variable_name_$k").data.sameElements(
        Array.tabulate(4)(i => k * 7.0 + i)), s"var $k")
    }
  }

  test("property: dense groups round-trip across random link counts (10 files)") {
    val rnd = new scala.util.Random(61)
    val dir = tmp("h5denseprop")
    (1 to 10).foreach { t =>
      val nVars = 9 + rnd.nextInt(52) // 10..61 links, all past compact
      val n = 2 + rnd.nextInt(6)
      val y = Array.tabulate(n)(_ * 1.0)
      val vars = (0 until nVars).map { k =>
        (s"v${t}_$k", Seq("y"), Array.fill(n)(rnd.nextDouble() * 100 - 50))
      }
      val p = s"$dir/f$t.nc"
      Hdf5Source.writeLatest(p, Seq(NcDim("y", n)), Seq("y" -> y), vars,
        deflate = t % 2 == 0, shuffle = t % 3 == 0)
      val nc = NetcdfSource.read(p)
      assert(nc.vars.length == nVars + 1, s"file $t var count")
      vars.foreach { case (vn, _, data) =>
        assert(nc.varByName(vn).data.sameElements(data), s"file $t $vn")
      }
    }
  }

  test("lookup3 checksum matches published hashlittle vectors") {
    // Bob Jenkins' reference self-test values for hashlittle(), initval 0:
    // hashlittle("", 0) = 0xdeadbeef; hashlittle("Four score and seven
    // years ago", 0) = 0x17770551 (from lookup3.c's driver comments)
    def h(s: String): Long =
      Hdf5Source.lookup3(s.getBytes("US-ASCII"), 0, s.length) & 0xffffffffL
    assert(h("") == 0xdeadbeefL)
    assert(h("Four score and seven years ago") == 0x17770551L)
  }
}
