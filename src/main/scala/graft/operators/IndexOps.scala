package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-index build + incremental maintenance (BM25 over an inverted
  * index). The reference scores corpora in one pass; at 100 TB the index is
  * a STORED artifact (tf/df/corpus-stats tables) and corpus growth must be
  * absorbed by appending — re-deriving df/idf from the full text is a full
  * corpus re-scan. [[appendToBmIndex]] touches ONLY the new documents plus
  * the (term-sized) df table and the one-row stats table:
  *
  *  - `tf`  (doc_id, term, tf, dlen): new docs' postings UNION the stored
  *    postings — append-only, no shuffle of the stored side;
  *  - `df`  (term, df): full-outer merge of stored df with the delta's
  *    per-term df (term-cardinality-sized, broadcastable);
  *  - `stats` (n_docs, tot_len): one-row increment.
  *
  * All maintained quantities are exact integers, so scores computed from a
  * maintained index are BIT-IDENTICAL to a from-scratch rebuild —
  * `q_bm25_incremental`'s oracle is the full-corpus rebuild, making that
  * equality the checked contract. Documents must be append-only (re-adding
  * a doc_id would double-count, the same contract as a segment append in
  * any inverted index).
  */
object IndexOps {

  /** A BM25 index: postings with denormalized doc length, per-term doc
    * frequency, and one-row corpus stats.
    */
  final case class BmIndex(tf: DataFrame, df: DataFrame, stats: DataFrame)

  private def postings(docs: DataFrame, docCol: String, textCol: String,
                       terms: Seq[String]): DataFrame = {
    val lens = docs.select(col(docCol).as("doc_id"),
      size(split(col(textCol), " ")).as("dlen"))
    docs.select(col(docCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(lens, Seq("doc_id"))
  }

  /** Full-scan index build over `terms` (the query vocabulary). */
  def buildBmIndex(docs: DataFrame, docCol: String, textCol: String,
                   terms: Seq[String]): BmIndex = {
    val tf = postings(docs, docCol, textCol, terms)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs
      .select(size(split(col(textCol), " ")).cast("long").as("dlen"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dlen")).as("tot_len"))
    BmIndex(tf, df, stats)
  }

  /** Absorb `newDocs` into an existing index without touching the stored
    * corpus text: scans only the delta; merges the term-sized df table;
    * increments the one-row stats.
    */
  def appendToBmIndex(idx: BmIndex, newDocs: DataFrame, docCol: String,
                      textCol: String, terms: Seq[String]): BmIndex = {
    val tfNew = postings(newDocs, docCol, textCol, terms)
    val dfNew = tfNew.groupBy("term").agg(count(lit(1)).as("df_delta"))
    val df2 = idx.df.join(dfNew, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("df"), lit(0L)) +
          coalesce(col("df_delta"), lit(0L))).as("df"))
    val statsNew = newDocs
      .select(size(split(col(textCol), " ")).cast("long").as("dlen"))
      .agg(count(lit(1)).as("dn"), sum(col("dlen")).as("dlen_sum"))
    val stats2 = idx.stats.crossJoin(statsNew)
      .select((col("n_docs") + col("dn")).as("n_docs"),
        (col("tot_len") + col("dlen_sum")).as("tot_len"))
    BmIndex(idx.tf.unionByName(tfNew), df2, stats2)
  }

  /** BM25 (k1 = 1.2, b = 0.75) top-k docs per query from an index. IDF and
    * per-term contributions are rounded to integer micro-units so the SQL
    * oracle reproduces the ranking decision exactly (the one ln() per
    * TERM is dim-table-sized — the DSIR discipline). Output
    * (query_id, rank, doc_id, score), rank 1 = best, ties → smaller doc_id.
    */
  def bm25TopK(idx: BmIndex, queryTerms: Seq[(Int, String)], k: Int): DataFrame = {
    val spark = idx.tf.sparkSession
    val idf = idx.df
      .crossJoin(broadcast(idx.stats))
      .select(col("term"),
        round(lit(1000000.0) *
          log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
          .cast("long").as("idfq"))
    val q = spark.createDataFrame(queryTerms).toDF("query_id", "term")
    val contrib = idx.tf
      .join(broadcast(idf), Seq("term"))
      .crossJoin(broadcast(idx.stats))
      .select(col("term"), col("doc_id"),
        round(col("idfq") * ((col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
            ((col("dlen").cast("long") * col("n_docs")).cast("double") /
              col("tot_len").cast("double"))))))
          .cast("long").as("contrib"))
    contrib.join(broadcast(q), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("score"))
      .groupBy("query_id")
      .agg(graft.functions.TopK.bottomK(
        struct(negate(col("score")).as("__o"), col("doc_id"), col("score")), k)
        .as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__r")))
      .select(col("query_id").cast("int").as("query_id"),
        (col("__p") + 1).cast("long").as("rank"),
        col("__r.doc_id").as("doc_id"), col("__r.score").as("score"))
  }
}
