package graft.tools
import graft.GraftSession
import org.apache.spark.sql.functions._
/** Scratch: compare Spark round(v,6) with DuckDB on midpoint doubles. */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    import spark.implicits._
    val vals = (0 until 2000 by 7).map(k => (2 * k + 1) / 2e6 + k)
    val out = vals.toDF("v").select(col("v"), round(col("v"), 6).as("r"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    println("SPARKROUND " + out.take(4).mkString(";"))
    // dump all for diff
    val s = out.map(_._2).mkString(",")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/spark_round.txt"), s)
    spark.stop()
  }
}
