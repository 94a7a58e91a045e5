package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native span hash (graft.functions.SpanHash60) is a bit-exact
  * twin of the tree it replaced:
  * `transform over shinglesOf(w, n)` + `conv(substring(md5(__g),1,15),16,10)`.
  */
class SpanHash60Spec extends AnyFunSuite {
  private lazy val spark = GraftSession.get()

  /** The replaced per-element form: hash60 of each shingle string. */
  private def oldTree(w: org.apache.spark.sql.Column, n: Int) =
    transform(TextOps.shinglesOf(w, n), g =>
      conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long"))

  test("equals the replaced shingle+md5 tree on the real corpus") {
    val withW = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 20)
    val both = withW.select(col("doc_id"),
      graft.functions.SpanHash60.col(col("w"), 20).as("native"),
      oldTree(col("w"), 20).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
  }

  test("edges: short arrays empty, null tokens skipped like concat_ws") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array('a', 'b', 'c')),
        |  (2L, array('a', 'b')),
        |  (3L, array('a', CAST(NULL AS STRING), 'c', 'd')),
        |  (4L, array('', '', ''))
        |AS t(doc_id, w)""".stripMargin)
    val both = df.select(col("doc_id"),
      graft.functions.SpanHash60.col(col("w"), 3).as("native"),
      oldTree(col("w"), 3).as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
    val byId = both.map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(byId(2L).isEmpty) // shorter than n
    assert(byId(3L).size == 2 && byId(4L).size == 1)
  }

  test("stays native in the executed plan") {
    val plan = spark.range(1).select(
        graft.functions.SpanHash60.col(array(lit("a"), lit("b")), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("span_hash60") && !plan.contains("UDF"), plan)
  }
}
