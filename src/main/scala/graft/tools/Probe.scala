package graft.tools

/** Scratch main for local probing — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val e = graft.SparkEntry.entry(spark)
    println(s"[probe] entry rows=${e.count()}")
    e.show(5, truncate = false)
    spark.stop()
  }
}
