package graft

import graft.operators.{LmOps, PcaOps, QuantileOps, SketchOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchQuantileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  test("CMS never under-counts and counter table is data-independent in size") {
    import spark.implicits._
    val w = 256L
    val dep = 4
    // zipfian-ish: key k appears 1000/k times
    val rows = (1 to 50).flatMap(k => Seq.fill(1000 / k)(k.toLong)).toDF("k")
    val cms = SketchOps.buildCms(rows, "k", w, dep).cache()
    assert(cms.count() <= w * dep, "counter table exceeded depth*width")
    val exact = rows.groupBy("k").agg(count(lit(1)).as("exact_n"))
    val probed = SketchOps.probeCms(exact, "k", cms, w, dep).collect()
    assert(probed.length == 50)
    probed.foreach { r =>
      val ex = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(est >= ex, s"CMS under-counted key ${r.get(0)}: $est < $ex")
    }
    // total mass conservation per sketch row: each row's counters sum to n
    val n = rows.count()
    val perRow = cms.groupBy("row").agg(sum(col("cnt")).as("s")).collect()
    assert(perRow.length == dep)
    perRow.foreach(r => assert(r.getAs[Long]("s") == n))
    cms.unpersist()
  }

  test("exact quantiles match a full sort, including negatives and duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (1 to 5000).map(_ => (rnd.nextInt(2000) - 700).toLong)
    val df = vals.toDF("v").repartition(8)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = QuantileOps.exactQuantiles(df, "v", ps, coarseShift = 6)
      .collect().map(r => (r.getDouble(0), r.getLong(2))).toMap
    val sorted = vals.sorted
    ps.foreach { p =>
      val k = math.floor(p * (vals.length - 1)).toLong.toInt
      assert(got(p) == sorted(k), s"p=$p: got ${got(p)} want ${sorted(k)}")
    }
  }

  test("exactQuantiles* reject fractional columns loudly (no silent truncation)") {
    import spark.implicits._
    val df = Seq(("a", 1.5), ("a", 2.5)).toDF("g", "v")
    val e1 = intercept[IllegalArgumentException] {
      QuantileOps.exactQuantiles(df, "v", Seq(0.5))
    }
    assert(e1.getMessage.contains("quantileFold"))
    val e2 = intercept[IllegalArgumentException] {
      QuantileOps.exactQuantilesBy(df, Seq("g"), "v", Seq(0.5))
    }
    assert(e2.getMessage.contains("groupedQuantileFold"))
  }

  test("grouped exact quantiles match per-group full sorts") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      (s"g${i % 3}", (rnd.nextInt(3000) - 900).toLong)
    }
    val df = rows.toDF("g", "v").repartition(7)
    val ps = Seq(0.0, 0.5, 0.95, 1.0)
    val got = QuantileOps.exactQuantilesBy(df, Seq("g"), "v", ps, coarseShift = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getLong(3)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val sorted = grp.map(_._2).sorted
      ps.foreach { p =>
        val k = math.floor(p * (sorted.length - 1)).toInt
        assert(got((g, p)) == sorted(k),
          s"group $g p=$p: got ${got((g, p))} want ${sorted(k)}")
      }
    }
  }

  test("PCA power iteration is bit-identical across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val emb = (0 until 300).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextGaussian() * 0.5).toFloat))
    }
    val a = PcaOps.powerIteration2(emb.toDF("vec_id", "e").repartition(1), "e")
      .orderBy("i").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val b = PcaOps.powerIteration2(emb.toDF("vec_id", "e").repartition(13), "e")
      .orderBy("i").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(a.length == 16 && a.sameElements(b))
    // the iterate must correlate with the dominant direction: planted
    // corpus where dim 0 carries 10x the variance
    val planted = (0 until 300).map { i =>
      val v = Array.fill(16)((rnd.nextGaussian() * 0.1).toFloat)
      v(0) = (rnd.nextGaussian() * 3.0).toFloat
      (i.toLong, v)
    }
    val c = PcaOps.powerIteration2(planted.toDF("vec_id", "e"), "e")
      .orderBy("i").collect().map(r => math.abs(r.getLong(2)))
    assert(c(0) == c.max, "dominant dimension did not dominate the iterate")
  }

  test("BPE merge application is greedy left-to-right, chains included") {
    import spark.implicits._
    import graft.operators.BpeOps
    // "aaaa" x1: step 1 must pick (a,a) with count 3 and produce (aa)(aa)
    // — NOT (aa)(a)(a) (a broken boundary representation under-merges);
    // step 2 then merges (aa,aa)
    val words = BpeOps.wordTable(Seq("aaaa").toDF("text"), "text")
    val (merges, finalWords) = BpeOps.train(words, 2)
    assert(merges == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)), merges)
    assert(finalWords.select("repr").head.getString(0) == "(aaaa)")
    // odd chain: "aaa aaa" (two words) -> (aa)(a) each; pair (a,a) count 4
    val w2 = BpeOps.wordTable(Seq("aaa aaa").toDF("text"), "text")
    val (m2, f2) = BpeOps.train(w2, 1)
    assert(m2 == Seq((1L, "a", "a", 4L)), m2)
    assert(f2.select("repr").head.getString(0) == "(aa)(a)")
  }

  test("BPE training is invariant to corpus partitioning") {
    import spark.implicits._
    import graft.operators.BpeOps
    val texts = Seq("the cat sat on the mat", "the bat and the cat",
      "that hat is flat", "matter chatter patter", "the the the")
    val a = BpeOps.train(
      BpeOps.wordTable(texts.toDF("text").repartition(1), "text"), 5)._1
    val b = BpeOps.train(
      BpeOps.wordTable(texts.toDF("text").repartition(7), "text"), 5)._1
    assert(a == b)
    assert(a.length == 5)
  }

  test("NFC normalization composes combining sequences and is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    import graft.functions.NfcNormalize
    val df = Seq("cafe\u0301", "caf\u00e9", "plain ascii", "pin\u0303a")
      .toDF("t")
      .withColumn("nt", ColumnBridge.column(
        NfcNormalize(ColumnBridge.expression(col("t")))))
      .withColumn("nt2", ColumnBridge.column(
        NfcNormalize(ColumnBridge.expression(col("nt")))))
    val rows = df.collect()
    assert(rows(0).getString(1) == "caf\u00e9", "decomposed must compose")
    assert(rows(1).getString(1) == "caf\u00e9", "precomposed unchanged")
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "pi\u00f1a")
    rows.foreach(r => assert(r.getString(1) == r.getString(2), "idempotent"))
  }

  test("bigram LM scores reference-like docs below gibberish") {
    import spark.implicits._
    val ref = (0 until 40).map(i =>
      (i.toLong * 7, "the model of the data is the result of the method", "src0"))
    val like = (0 until 10).map(i =>
      (1000L + i, "the model of the method is the data", "src0"))
    val junk = (0 until 10).map(i =>
      (2000L + i, s"zq$i xv$i qq$i jj$i kk$i ww$i", "src0"))
    val docs = (ref ++ like ++ junk).toDF("doc_id", "text", "source")
    val (m2, m1, c0) = LmOps.bigramModel(
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    val scored = LmOps.scoreDocs(docs, "doc_id", "text", m2, m1, c0,
      keep = Seq("source")).cache()
    val likeAvg = scored.filter(col("doc_id").between(1000, 1009))
      .agg(avg(col("score"))).head.getDouble(0)
    val junkAvg = scored.filter(col("doc_id") >= 2000)
      .agg(avg(col("score"))).head.getDouble(0)
    assert(likeAvg < junkAvg,
      s"reference-like docs must score lower NLL: $likeAvg vs $junkAvg")
    // every document survives scoring (bigram-less docs get the constant)
    assert(scored.count() == docs.count())
    scored.unpersist()
  }
}
