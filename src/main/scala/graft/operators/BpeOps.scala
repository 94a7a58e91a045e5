package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * subword-vocabulary induction step of every modern pretraining pipeline,
  * run over the corpus the engine just curated.
  *
  * Scale design (the classic trick): training never touches documents —
  * it runs on the WORD-FREQUENCY table (one map-side-combined groupBy of
  * the corpus, cardinality = vocabulary, not volume). Each merge step is
  * one pair-count aggregation over that table (explode adjacent pairs
  * weighted by word count, map-side combined) + a 1-row argmax collect;
  * applying the merge is a scan-local string rewrite. At 100 TB the word
  * table is millions of rows where the corpus is trillions — the per-step
  * cost is corpus-INDEPENDENT after the first aggregation.
  *
  * Determinism and engine portability: token sequences are carried in a
  * parenthesis-wrapped representation — "low" = `(l)(o)(w)` — so a merge
  * (x,y)→xy is EXACTLY `replace(repr, "(x)(y)", "(xy)")`: the `(`/`)`
  * bounds make a cross-token or token-suffix match impossible (tokens are
  * [a-z]+ only), and because adjacent pairs share no separator character,
  * one left-to-right non-overlapping replace pass — the semantics of
  * `replace` in Spark, DuckDB and Java alike — IS the full greedy
  * application of that merge rule ("(a)(a)(a)(a)" → "(aa)(aa)").
  * Ties in the pair argmax break by (count desc, left asc, right asc).
  */
object BpeOps {

  /** Word-frequency table from `textCol`: lowercase, strip to [a-z ],
    * split on single spaces, drop empties; returns (repr, wcnt) with
    * `repr` the wrapped single-char tokenization. */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(regexp_replace(lower(col(textCol)),
        "[^a-z ]", ""), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wcnt"))
      .select(regexp_replace(col("w"), "(.)", "($1)").as("repr"), col("wcnt"))

  /** Adjacent-pair counts over the word table, weighted by word count. */
  def pairCounts(words: DataFrame): DataFrame = {
    val toks = split(expr("substring(repr, 2, length(repr) - 2)"), "\\)\\(")
    words
      .select(col("wcnt"), posexplode(slice(toks, lit(1),
        greatest(size(toks) - 1, lit(0)))).as(Seq("__p", "t1")),
        toks.as("__t"))
      .withColumn("t2", col("__t").getItem(col("__p") + 1))
      .groupBy("t1", "t2").agg(sum(col("wcnt")).as("pair_count"))
  }

  /** Train `steps` merges. Returns (merge table rows (step, t1, t2,
    * pair_count), final word table). The per-step argmax is a bounded
    * 1-row collect (the merge RULE is driver-state by nature — it
    * parameterizes the next scan's rewrite). */
  def train(words0: DataFrame, steps: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var words = words0
    val merges = (1 to steps).flatMap { step =>
      val top = pairCounts(words)
        .orderBy(col("pair_count").desc, col("t1"), col("t2"))
        .limit(1).collect()
      top.headOption.map { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        words = words.withColumn("repr",
          expr(s"replace(repr, '($a)($b)', '($a$b)')"))
        (step.toLong, a, b, r.getLong(2))
      }
    }
    (merges, words)
  }
}
