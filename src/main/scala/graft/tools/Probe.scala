package graft.tools

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Scratch main for local probing — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.GraftSession.table(spark, d, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("docs scan")(docs.count())
    val withSh = TextOps.shingleArrays(docs, "doc_id", "text", 3)
    time("shingleArrays")(withSh.count())
    val sigs = TextOps.minhashSignatures(withSh, "doc_id", 8)
    time("minhashSignatures(8)")(sigs.count())
    val bands = TextOps.lshBandRows(sigs, "doc_id", 2, 8)
    time("lshBandRows")(bands.count())
    val cands = TextOps.candidatePairs(bands, "doc_id")
    time("candidatePairs")(cands.count())
    time("jaccard")(TextOps.jaccardOnCandidates(cands, sigs, "doc_id").count())
    time("full q_dedup_near")(graft.ops.PipelinePack.queries("q_dedup_near")(spark, d).count())
    time("q_fingerprint")(graft.ops.PipelinePack.queries("q_fingerprint")(spark, d).count())
    val q = graft.ops.PipelinePack.queries("q_dedup_near")(spark, d)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    println("[probe] ReusedExchange nodes: " +
      "ReusedExchange|AQEShuffleRead|Exchange".r.findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
    println("[plan] ---- withSh executed plan ----")
    println(withSh.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
