package graft.tools

import graft.GraftSession
import graft.operators.{ClusterOps, TextOps}
import org.apache.spark.sql.functions._

/** Scratch probe: times the connected-components step of q_dedup_clusters
  * in a warm JVM (6 repetitions, so JIT steady state is visible), separating
  * the LSH-pair build from the CC iteration so optimization work measures
  * the right thing.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = GraftSession.table(spark, d, "documents")
    val sigs = TextOps.minhashSignatures(
      TextOps.shingleArrays(docs, "doc_id", "text", 3), "doc_id", 64)
    val bands = TextOps.lshBandRows(sigs, "doc_id", 4, 64)
    val pairs = TextOps.jaccardOnCandidates(
        TextOps.candidatePairs(bands, "doc_id", 1000), sigs, "doc_id")
      .filter(col("jaccard") >= 0.5)
      .localCheckpoint(true)
    println(s"[ccprobe] pairs = ${pairs.count()}")
    (1 to 6).foreach { rep =>
      val t0 = System.nanoTime()
      val cc = ClusterOps.connectedComponents(pairs, "doc_a", "doc_b")
      val n = cc.groupBy("comp").count().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccprobe] rep $rep: $dt%.2f s, $n clusters")
    }
    spark.stop()
  }
}
