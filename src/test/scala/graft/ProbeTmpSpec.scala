package graft

import graft.sources.ZarrSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ProbeTmpSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("probe abs pushdown vs ansi") {
    import spark.implicits._
    println(s"PROBE ansi=${spark.conf.get("spark.sql.ansi.enabled")}")
    val base = new java.io.File("/root/repo/target/tmp-tests")
    base.mkdirs()
    val g = Files.createTempDirectory(base.toPath, "absprobe").toString + "/c.zarr"
    val t = Array(0.0, 1.0)
    val df = t.toSeq.map(ti => (ti, ti + 1)).toDF("t", "v")
    ZarrSource.writeCubeVars(df, g, Seq("v"), Seq("t" -> t), chunks = Seq(2))
    val vv = when(col("v").cast("double") <= lit(Double.PositiveInfinity),
      col("v").cast("double"))
    val shapes = Seq(
      "absPlain" -> max(abs(col("v"))),
      "absGuard" -> max(abs(vv)),
      "guardAbs" -> max(when(col("v").cast("double") <=
        lit(Double.PositiveInfinity), abs(col("v").cast("double")))))
    shapes.foreach { case (nm, agg) =>
      val q = spark.read.format("zarr").load(g).groupBy(col("t")).agg(agg.as("m"))
      val s = q.queryExecution.executedPlan.toString
      println(s"PROBE shape=$nm pushed=${s.contains("ZarrVarAggScan")}")
      if (!s.contains("ZarrVarAggScan")) println("PROBE plan " + nm + ": " + s.replace("\n"," | ").take(600))
    }
    spark.conf.unset("spark.sql.ansi.enabled")
  }
}
