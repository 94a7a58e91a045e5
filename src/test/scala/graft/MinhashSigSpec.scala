package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native MinHash signature (graft.functions.MinhashSig) is a
  * bit-exact twin of the HOF tree it replaced:
  * `array(array_min(transform(transform(sh, hash60), permuted(_, p))) × P)`.
  */
class MinhashSigSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get()

  /** The replaced tree, verbatim (hash60/permuted are the pinned
    * oracle-portable Column forms). */
  private def oldTree(sh: org.apache.spark.sql.Column, numPerms: Int) = {
    val h60 = transform(sh, s => TextOps.hash60(s))
    array((0 until numPerms).map(p =>
      array_min(transform(h60, h => TextOps.permuted(h, p)))): _*)
  }

  test("equals the replaced HOF tree on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val withSh = TextOps.shingleArrays(docs, "doc_id", "text", 3)
    val both = withSh.select(col("doc_id"),
        graft.functions.MinhashSig.col(col("sh"), 32).as("native"),
        oldTree(col("sh"), 32).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Any](1)} != hof ${r.getSeq[Any](2)}")
    }
  }

  test("null/empty edges match: empty and all-null arrays give null mins") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array('alpha beta g', 'beta g d')),
        |  (2L, array()),
        |  (3L, array(CAST(NULL AS STRING))),
        |  (4L, array('x y z', CAST(NULL AS STRING)))
        |AS t(doc_id, sh)""".stripMargin)
    val both = df.select(col("doc_id"),
      graft.functions.MinhashSig.col(col("sh"), 4).as("native"),
      oldTree(col("sh"), 4).as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Any](1)} != hof ${r.getSeq[Any](2)}")
    }
    // empty + all-null rows: an ARRAY of nulls, not a null array
    val byId = both.map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(byId(2L) == Seq(null, null, null, null))
    assert(byId(3L) == Seq(null, null, null, null))
    assert(byId(4L).forall(_ != null))
  }

  test("stays native in the executed plan") {
    val plan = spark.range(1).select(
        graft.functions.MinhashSig.col(array(lit("a b c")), 8))
      .queryExecution.executedPlan.toString
    assert(plan.contains("minhash_sig") && !plan.contains("UDF"), plan)
  }
}
