package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch probe for the q_curation bench row: times the query under
  * AQE coalescing variants (advisory partition size × parallelismFirst)
  * on one JVM so scheduler/JIT noise cancels. Round-17 diagnosis aid —
  * not part of the library surface. */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = sys.env.getOrElse("PROBE_QUERIES",
      "q_curation,q_modern_curation,q_dedup_clusters,q_pagerank")
      .split(",").toSeq
    val spark = GraftSession.get()
    def time(q: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def med3(q: String): Double = {
      time(q) // warm
      val ts = (1 to 3).map(_ => time(q)).sorted
      ts(1)
    }
    val variants = Seq(
      ("pf=false adv=64m", "false", "64m"),
      ("pf=false adv=8m", "false", "8m"),
      ("pf=false adv=2m", "false", "2m"),
      ("pf=true  adv=64m", "true", "64m"))
    for ((label, pf, adv) <- variants) {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
      val line = qs.map(q => f"$q=${med3(q)}%.2f").mkString(" ")
      println(s"[probe] $label  $line")
    }
    spark.stop()
  }
}
