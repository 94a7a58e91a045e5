package graft

import graft.sources.{DataStore, ZarrSource}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

class ZarrSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def tmpDir(prefix: String): String = {
    val base = new java.io.File("/root/repo/target/tmp-tests")
    base.mkdirs()
    Files.createTempDirectory(base.toPath, prefix).toString
  }

  test("distributed write → read round-trip with edge chunks and fill") {
    import spark.implicits._
    // 3×5 grid, 2×2 chunks → 2×3 chunk grid, both edges ragged; one cell
    // (y=20, x=3) never written → NaN fill
    val ys = Array(10.0, 20.0, 30.0)
    val xs = Array(0.5, 1.5, 2.5, 3.5, 4.5)
    val rows = for {
      (y, j) <- ys.zipWithIndex.toSeq
      (x, i) <- xs.zipWithIndex
      if !(j == 1 && i == 3)
    } yield (y, x, j * 10.0 + i)
    val g = s"${tmpDir("zarr")}/cube.zarr"
    ZarrSource.writeCube(rows.toDF("y", "x", "v"), g, "v",
      Seq("y" -> ys, "x" -> xs), chunks = Seq(2, 2))
    // chunk files exist with the spec's dotted names
    assert(Files.exists(Paths.get(s"$g/v/0.0")) && Files.exists(Paths.get(s"$g/v/1.2")))
    assert(Files.exists(Paths.get(s"$g/.zgroup")))
    val back = ZarrSource.readCube(spark, g, "v").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(back.size == 15)
    assert(back((10.0, 0.5)) == 0.0 && back((30.0, 4.5)) == 24.0)
    assert(back((20.0, 2.5)) == 12.0)
    assert(back((20.0, 3.5)).isNaN) // unwritten cell = fill
    // store-level open with format inference picks the data variable
    val opened = DataStore.openDataset(spark, g)
    assert(opened.columns.toSeq == Seq("y", "x", "v"))
    assert(opened.count() == 15)
  }

  test("3-D cube, a chunk with NO rows is absent and reads as fill") {
    import spark.implicits._
    val ts = Array(0.0, 1.0)
    val ys = Array(0.5, 1.5)
    val xs = Array(0.5, 1.5)
    // only t=0 cells present → the whole t=1 chunk plane is missing
    val rows = for { y <- ys.toSeq; x <- xs } yield (0.0, y, x, y + x)
    val g = s"${tmpDir("zarr3")}/c.zarr"
    ZarrSource.writeCube(rows.toDF("t", "y", "x", "v"), g, "v",
      Seq("t" -> ts, "y" -> ys, "x" -> xs), chunks = Seq(1, 2, 2))
    assert(Files.exists(Paths.get(s"$g/v/0.0.0")))
    assert(!Files.exists(Paths.get(s"$g/v/1.0.0"))) // empty chunk not written
    val back = ZarrSource.readCube(spark, g, "v")
    assert(back.count() == 8)
    assert(back.filter(col("t") === 1.0 && !isnan(col("v"))).count() == 0)
    assert(back.filter(col("t") === 0.0 && isnan(col("v"))).count() == 0)
  }

  test("consolidated .zmetadata is written and is sufficient on its own") {
    import spark.implicits._
    val ys = Array(1.0, 2.0)
    val xs = Array(3.0, 4.0)
    val g = s"${tmpDir("zarrcons")}/c.zarr"
    ZarrSource.writeCube(
      Seq((1.0, 3.0, 10.0), (2.0, 4.0, 20.0)).toDF("y", "x", "v"),
      g, "v", Seq("y" -> ys, "x" -> xs), chunks = Seq(2, 2))
    assert(Files.exists(Paths.get(s"$g/.zmetadata")))
    // remove every per-array metadata file: the consolidated document must
    // carry the reader by itself (the object-store fast path)
    Seq("y", "x", "v").foreach { a =>
      Files.delete(Paths.get(s"$g/$a/.zarray"))
      Files.delete(Paths.get(s"$g/$a/.zattrs"))
    }
    assert(ZarrSource.listArrays(g) == Seq("v", "x", "y"))
    val za = ZarrSource.openArray(s"$g/v")
    assert(za.dims == Seq("y", "x") && za.shape == Seq(2, 2))
    val back = ZarrSource.readCube(spark, g, "v").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(back((1.0, 3.0)) == 10.0 && back((2.0, 4.0)) == 20.0)
    assert(back((1.0, 4.0)).isNaN)
  }

  test("reads an externally-shaped layout: big-endian f4, raw, / separator") {
    // hand-written group: no coordinate arrays (index fallback), raw
    // compressor, ">f4" dtype, dimension_separator "/", fill_value 0
    val g = s"${tmpDir("zarrext")}/ext.zarr"
    new java.io.File(s"$g/a").mkdirs()
    Files.writeString(Paths.get(s"$g/.zgroup"), """{"zarr_format": 2}""")
    Files.writeString(Paths.get(s"$g/a/.zarray"),
      """{"zarr_format": 2, "dtype": ">f4", "shape": [2, 2], "chunks": [2, 1],
        | "fill_value": 0, "compressor": null, "filters": null, "order": "C",
        | "dimension_separator": "/"}""".stripMargin)
    // chunk (0,0): column 0 = [1.5, 3.5]; chunk (0,1) left missing → fill
    val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN)
    b.putFloat(1.5f); b.putFloat(3.5f)
    new java.io.File(s"$g/a/0").mkdirs()
    Files.write(Paths.get(s"$g/a/0/0"), b.array())
    val za = ZarrSource.openArray(s"$g/a")
    assert(za.separator == "/" && !za.zlib && za.fillValue == 0.0)
    assert(za.dims == Seq("dim_0", "dim_1")) // no _ARRAY_DIMENSIONS → synthetic
    val back = ZarrSource.readCube(spark, g, "a").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(back == Map((0.0, 0.0) -> 1.5, (1.0, 0.0) -> 3.5,
      (0.0, 1.0) -> 0.0, (1.0, 1.0) -> 0.0))
  }

  test("rejects what it cannot read, loudly") {
    val g = s"${tmpDir("zarrbad")}/bad.zarr"
    new java.io.File(s"$g/a").mkdirs()
    Files.writeString(Paths.get(s"$g/.zgroup"), """{"zarr_format": 2}""")
    Files.writeString(Paths.get(s"$g/a/.zarray"),
      """{"zarr_format": 2, "dtype": "<f8", "shape": [2], "chunks": [2],
        | "fill_value": null, "compressor": {"id": "blosc", "cname": "lz4"},
        | "filters": null, "order": "C"}""".stripMargin)
    val e = intercept[IllegalArgumentException](ZarrSource.openArray(s"$g/a"))
    assert(e.getMessage.contains("blosc"))
    val e2 = intercept[IllegalArgumentException](
      ZarrSource.listArrays(s"$g/nope"))
    assert(e2.getMessage.contains(".zgroup"))
  }
}
