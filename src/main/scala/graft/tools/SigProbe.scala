package graft.tools

import org.apache.spark.sql.functions._

/** Scratch main: where do the dedup-family seconds go? Times the minhash
  * signature pipeline stage by stage at SPARK_GRAFT_SF_DIR — shingling,
  * base hashing, the 32-permutation signature fold — so the interpreted
  * higher-order-function cost is separated from md5 and shuffle cost.
  */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.TextOps
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[sig] $label%-28s median ${ts(1)}%.3f s")
    }

    val withSh = TextOps.shingleArrays(docs, "doc_id", "text", 5)
    time("shingles only") {
      withSh.agg(sum(size(col("sh")))).head.getLong(0)
    }
    val h60 = withSh.select(col("doc_id"),
      transform(col("sh"), s => TextOps.hash60(s)).as("h60"))
    time("shingles + md5 hash60") {
      h60.agg(sum(size(col("h60")))).head.getLong(0)
    }
    val sigs = TextOps.minhashSignatures(withSh, "doc_id", 32)
    time("full 32-perm signatures") {
      sigs.agg(sum(element_at(col("mh"), 1))).head.getLong(0)
    }
    println(s"[sig] docs=${docs.count()} " +
      s"shingleSum=${withSh.agg(sum(size(col("sh")))).head.getLong(0)}")
    spark.stop()
  }
}
