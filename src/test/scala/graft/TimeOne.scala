/** Warm-JVM repetition probe for one query: `Test/runMain TimeOne <q> <sfDir>`.
  * Bench medians can still carry first-touch noise; this isolates one query's
  * steady state (rep1 = cold, reps 2-4 = warm).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val q = args(0); val sf = args(1)
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sf).count()
      println(f"[timeone] $q rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
