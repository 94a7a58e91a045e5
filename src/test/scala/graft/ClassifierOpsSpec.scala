package graft

import graft.operators.ClassifierOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def plantedCorpus = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val good = Vector("the", "quick", "analysis", "shows", "clear", "results",
      "with", "strong", "evidence", "and", "careful", "method")
    val bad = Vector("zzz", "click", "buy", "now", "xxx", "free", "win",
      "cash", "prize", "offer", "deal", "spam")
    (0 until 200).map { i =>
      val vocab = if (i % 2 == 0) good else bad
      val text = (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, i % 2 == 0)
    }.toDF("doc_id", "text", "is_good")
  }

  test("LR quality classifier trains to >95% accuracy on separable corpus") {
    val dim = 32
    val feats = ClassifierOps.hashedFeatures(plantedCorpus, "doc_id", "text",
      col("is_good"), dim).cache()
    val w = ClassifierOps.train(feats, dim, steps = 30, learningRate = 8.0)
    val scored = ClassifierOps.score(feats, w.toSeq).cache()
    val n = scored.count()
    val correct = scored.filter(col("keep") === (col("label") === 1)).count()
    assert(n == 200)
    assert(correct >= 190, s"accuracy ${correct.toDouble / n}")
    feats.unpersist(); scored.unpersist()
  }

  test("gradient step is invariant to partitioning (bit-for-bit)") {
    val dim = 32
    val w = Array.tabulate(dim)(b => ((b * 13) % 9 - 4).toDouble)
    val base = plantedCorpus
    def grad(parts: Int) =
      ClassifierOps.gradient(
        ClassifierOps.hashedFeatures(base.repartition(parts), "doc_id", "text",
          col("is_good"), dim), w.toSeq)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(grad(2) == grad(17))
  }

  test("DSIR importance scores separate target-like from raw-like docs") {
    import spark.implicits._
    // target docs (is_good) use the `good` vocabulary; DSIR targeting the
    // good half must score good docs positive and bad docs negative
    val df = plantedCorpus
    val model = ClassifierOps.dsirModel(df, "text", col("is_good"), 64)
    val scored = ClassifierOps.dsirScore(df, Seq("doc_id"), "text", model)
      .join(df.select("doc_id", "is_good"), "doc_id")
      .select(col("is_good"), (col("dsir_score") > 0).as("pos")).collect()
    assert(scored.forall(r => r.getBoolean(0) == r.getBoolean(1)),
      "every good doc positive, every bad doc negative on a separable corpus")
    // exact integer scores: partitioning cannot change them
    val m2 = ClassifierOps.dsirModel(df.repartition(13), "text", col("is_good"), 64)
    assert(m2.sameElements(model))
  }

  test("scoring plan is scan-shaped: no join, two exchanges at most") {
    val dim = 16
    val feats = ClassifierOps.hashedFeatures(plantedCorpus, "doc_id", "text",
      col("is_good"), dim)
    val plan = ClassifierOps.score(feats, Array.fill(dim)(1.0).toSeq)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "scoring must not join")
  }
}
