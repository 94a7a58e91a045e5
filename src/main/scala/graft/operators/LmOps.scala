package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering (Wenzek et al.
  * 2020) — train a bigram LM with add-one smoothing on a trusted reference
  * slice, score every document by its average negative log-likelihood, and
  * bucket the corpus into head/middle/tail perplexity terciles. This is the
  * quality filter whose "head" slice feeds most modern pretraining mixes.
  *
  * Scale design: the model build is two map-side-combined count
  * aggregations over the reference slice (bigram counts + context counts);
  * the per-(bigram) cost table is the MODEL, joined to the corpus by plain
  * shuffle equi-joins (at web scale the model no longer broadcasts — the
  * equi-join is the correct shape, with the unigram-backoff join catching
  * unseen bigrams). Scoring is then one per-document sum of exact longs.
  *
  * Determinism: costs are negative log-likelihoods in integer MICRO-NATS,
  * quantized once per distinct model row (round(10⁶·ln((c_ctx+V)/(c_bi+1)))
  * — the DSIR/BM25 discipline: ln() ulp freedom is confined to the bounded
  * model table, never re-evaluated per corpus row), so the document sums
  * are order-free exact and hash-match any SQL engine.
  */
object LmOps {

  /** (doc_id, w1, w2) bigram explode of whitespace-tokenized `textCol`;
    * keeps `keep` passthrough columns. Documents with < 2 tokens emit no
    * rows (they score 0 bigrams downstream). */
  def bigrams(df: DataFrame, idCol: String, textCol: String,
              keep: Seq[String] = Nil): DataFrame = {
    val t = col("__t")
    df.withColumn("__t", split(col(textCol), " "))
      .select((Seq(col(idCol)) ++ keep.map(col) :+ t :+
        posexplode(slice(t, lit(1), greatest(size(t) - 1, lit(0))))
          .as(Seq("__p", "w1"))): _*)
      .withColumn("w2", t.getItem(col("__p") + 1))
      .drop("__p", "__t")
  }

  /** Bigram model over the reference slice: returns
    * (bigram cost table, unigram backoff table, ln(V) constant cost).
    * costq = round(1e6·ln((c1+V)/(c2+1))): seen bigram; oovq =
    * round(1e6·ln(c1+V)): seen context, unseen bigram (c2 = 0); unseen
    * context costs round(1e6·ln(V)). V = distinct reference tokens.
    */
  def bigramModel(ref: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val bi = bigrams(ref, idCol, textCol)
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    // vocabulary over ALL reference tokens (w2 of the last bigram included
    // via the unioned w2 column; single-token docs contribute none — they
    // have no bigram rows on either engine)
    val vocab = bi.select(col("w1").as("t"))
      .union(bi.select(col("w2").as("t")))
      .agg(countDistinct(col("t")).as("v"))
    val model1 = c1.crossJoin(broadcast(vocab))
      .select(col("w1"), col("c1"), col("v"),
        round(lit(1e6) * log((col("c1") + col("v")).cast("double")), 0)
          .cast("long").as("oovq"))
    val model2 = c2.join(model1.select(col("w1"), col("c1"), col("v")), Seq("w1"))
      .select(col("w1"), col("w2"),
        round(lit(1e6) *
            log((col("c1") + col("v")).cast("double") / (col("c2") + 1)), 0)
          .cast("long").as("costq"))
    val const0 = vocab.select(
      round(lit(1e6) * log(col("v").cast("double")), 0).cast("long").as("constq"))
    (model2, model1.select(col("w1"), col("oovq")), const0)
  }

  /** Score every document: per-doc total cost (micro-nats, exact long) and
    * bigram count; score = cost div n_bigrams (average NLL — the
    * log-perplexity in integer micro-nats). Docs with no bigrams score the
    * unseen-context constant. */
  def scoreDocs(docsDf: DataFrame, idCol: String, textCol: String,
                model2: DataFrame, model1: DataFrame, const0: DataFrame,
                keep: Seq[String] = Nil): DataFrame = {
    val bi = bigrams(docsDf, idCol, textCol, keep)
    val costed = bi
      .join(model2, Seq("w1", "w2"), "left")
      .join(model1, Seq("w1"), "left")
      .crossJoin(broadcast(const0))
      .withColumn("cost", coalesce(col("costq"), col("oovq"), col("constq")))
    val perDoc = costed.groupBy((Seq(idCol) ++ keep).map(col): _*)
      .agg(sum(col("cost")).as("nll"), count(lit(1)).as("n_bigrams"))
    // left-join back so bigram-less docs stay in the corpus with the
    // unseen-context constant as their score
    docsDf.select((Seq(idCol) ++ keep).map(col): _*)
      .join(perDoc, Seq(idCol) ++ keep, "left")
      .crossJoin(broadcast(const0))
      .select((Seq(idCol) ++ keep).map(col) ++ Seq(
        coalesce(col("nll"), col("constq")).as("nll"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("nll div n_bigrams"), col("constq")).as("score")): _*)
  }
}
