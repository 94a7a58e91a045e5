package graft

import graft.cube.{Cube, GridMapping}
import graft.operators.ComputeOps
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class ComputeOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  private def cube(): Cube = {
    import spark.implicits._
    val gm = GridMapping(4, 2, 0.0, 0.0, 1.0, 1.0, tileWidth = 2, tileHeight = 2)
    val rows = for (j <- 0 until 2; i <- 0 until 4)
      yield (t0, j + 0.5, i + 0.5, (i + 1).toDouble)
    Cube(rows.toDF("time", "y", "x", "v"), gm)
  }

  test("computeCube runs the kernel once per block with all block rows") {
    val schema = StructType(Seq(
      StructField("block", LongType), StructField("n", IntegerType),
      StructField("vsum", DoubleType)))
    val out = ComputeOps.computeCube(cube(), schema) { (block, rows) =>
      val rs = rows.toVector
      val vIdx = rs.head.fieldIndex("v")
      Iterator.single(Row(block, rs.size, rs.map(_.getDouble(vIdx)).sum))
    }.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    // 2 blocks of 2x2: left block cells v=1,2 (x2 rows), right v=3,4 (x2)
    assert(out(0L) == ((4, 6.0)))
    assert(out(1L) == ((4, 14.0)))
  }

  test("varsToDim reshapes variable columns into (var, value) rows") {
    val c = cube().withDf(_.withColumn("w", col("v") * 10))
    val out = ComputeOps.varsToDim(c.copy(), Seq("v", "w"))
    assert(out.count() == 16)
    val sums = out.groupBy("var").agg(sum("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums("v") == 20.0 && sums("w") == 200.0)
  }

  test("combineCubes: full-outer merge with NaN for absent cells") {
    val c = cube()
    val a = c.copy(df = c.df.filter(col("x") < 3.0).withColumnRenamed("v", "va"))
    val b = c.copy(df = c.df.filter(col("x") >= 2.0).withColumnRenamed("v", "vb"))
    val m = ComputeOps.combineCubes(Seq(a, b)).df
    assert(m.count() == 8)
    val r = m.filter(col("x") === 0.5 && col("y") === 0.5).head()
    assert(r.getAs[Double]("va") == 1.0 && r.getAs[Double]("vb").isNaN)
    val r2 = m.filter(col("x") === 2.5 && col("y") === 0.5).head()
    assert(r2.getAs[Double]("va") == 3.0 && r2.getAs[Double]("vb") == 3.0)
  }
}
