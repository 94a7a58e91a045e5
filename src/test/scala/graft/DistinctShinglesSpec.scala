package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused native distinct-shingle pass (graft.functions.DistinctShingles)
  * is a bit-exact twin of `array_distinct(shinglesOf(w, n))` — values AND
  * order (first encounter).
  */
class DistinctShinglesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.get()

  private def oldTree(w: org.apache.spark.sql.Column, n: Int) =
    array_distinct(TextOps.shinglesOf(w, n))

  test("equals array_distinct(shinglesOf) on the real corpus, order included") {
    val withW = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
    val both = withW.select(col("doc_id"),
      graft.functions.DistinctShingles.col(col("w"), 3).as("native"),
      oldTree(col("w"), 3).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
  }

  test("edges: dup windows dedup in first-encounter order; short arrays empty") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array('a', 'b', 'a', 'b', 'a', 'b')),
        |  (2L, array('a', 'b')),
        |  (3L, array('x', CAST(NULL AS STRING), 'y', 'z')),
        |  (4L, array('', 'a', ''))
        |AS t(doc_id, w)""".stripMargin)
    val both = df.select(col("doc_id"),
      graft.functions.DistinctShingles.col(col("w"), 3).as("native"),
      oldTree(col("w"), 3).as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"doc ${r.getLong(0)}")
    }
    val byId = both.map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(byId(1L) == Seq("a b a", "b a b")) // 4 windows -> 2 distinct
    assert(byId(2L).isEmpty)
  }

  test("stays native in the executed plan") {
    val plan = spark.range(1).select(
        graft.functions.DistinctShingles.col(array(lit("a"), lit("b")), 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("distinct_shingles") && !plan.contains("UDF"), plan)
  }
}
