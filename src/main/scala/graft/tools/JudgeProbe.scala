package graft.tools

/** Scratch: warm-JVM repetition probe over a comma-separated query list
  * (adjudicates single-run bench swings; see memory note on bench noise).
  */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.headOption.getOrElse("q_rechunk,q_rectify").split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[judge] $n%-24s ${ts.map(t => f"$t%.2f").mkString(" / ")}")
    }
    spark.stop()
  }
}
