package graft.tools

/** Scratch probe: does a second invocation of a declared query reuse the
  * first invocation's persisted blocks (plan-keyed CacheManager entries
  * surviving the query's return — the r20 §3 hazard)? Prints per-invocation
  * wall time and the CacheManager/persistent-RDD population between calls.
  */
object CacheReuseProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = sys.env.getOrElse("PROBE_QUERIES",
      "q_pagerank,q_label_prop,q_triangles,q_pmi").split(",").toSeq
    qs.foreach { q =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        val nrdd = spark.sparkContext.getPersistentRDDs.size
        val cmEmpty = spark.sharedState.cacheManager.isEmpty
        println(f"[cachereuse] $q inv$i $dt%.2f s persistentRDDs=$nrdd cacheManagerEmpty=$cmEmpty")
      }
    }
    spark.stop()
  }
}
