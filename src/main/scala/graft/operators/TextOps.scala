package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline operators for large-scale training-data curation: exact and
  * near-duplicate detection (MinHash + banded LSH, SimHash), shingling,
  * tf-idf and corpus statistics.
  *
  * These go beyond the reference (which is raster-cube-focused) — they are
  * the document-pipeline counterpart the builder prompt requires, designed
  * scale-first:
  *  - near-dup detection is BANDED LSH: candidates come from an equi-join on
  *    (band, signature), never an all-pairs comparison; the exact Jaccard
  *    pass runs on the candidate set only.
  *  - every hash is md5 (codegen'd builtin) so the DuckDB oracle can mirror
  *    the arithmetic bit-for-bit.
  *  - all shapes are explode → groupBy: map-side combined, no driver loops.
  */
object TextOps {

  /** Whitespace-normalized lowercase text (content fingerprint basis). */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as strings; empty array when the doc is shorter
    * than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      .otherwise(array())
  }

  /** Per-(doc, permutation) MinHash values over the DISTINCT shingle set.
    * Permutation p is the md5 of `shingle + "#" + p` — lexicographic min of
    * hex strings, identical in any engine with md5.
    */
  def minhash(df: DataFrame, docCol: String, textCol: String,
              shingleN: Int, numPerms: Int): DataFrame =
    minhashFromShingles(
      shingleSet(df, docCol, textCol, shingleN), docCol, numPerms)

  /** The DISTINCT (doc, shingle) set — cache it when both the signatures
    * and a later exact-Jaccard pass need it (one shuffle instead of two
    * recomputations).
    */
  def shingleSet(df: DataFrame, docCol: String, textCol: String,
                 shingleN: Int): DataFrame =
    df.select(col(docCol), explode(shingles(col(textCol), shingleN)).as("shingle"))
      .distinct()

  def minhashFromShingles(sh: DataFrame, docCol: String, numPerms: Int): DataFrame =
    sh.withColumn("perm", explode(sequence(lit(0), lit(numPerms - 1))))
      .withColumn("h", md5(concat(col("shingle"), lit("#"), col("perm")).cast("binary")))
      .groupBy(col(docCol), col("perm"))
      .agg(min(col("h")).as("minh"))

  /** Group MinHash rows into LSH bands: one row per (doc, band) with the
    * band signature = comma-joined minhashes in permutation order.
    */
  def lshBands(mh: DataFrame, docCol: String, rowsPerBand: Int): DataFrame =
    mh.groupBy(col(docCol), (col("perm") / lit(rowsPerBand)).cast("int").as("band"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("perm"), col("minh")))),
          x => x.getField("minh"))).as("sig"))

  /** Candidate near-duplicate pairs: docs sharing any (band, signature)
    * bucket. Equi-join on the bucket key — the scale-safe core of LSH.
    */
  def candidatePairs(bands: DataFrame, docCol: String): DataFrame = {
    val a = bands.select(col(docCol).as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col(docCol).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact shingle-set Jaccard for given candidate pairs only. `shingleSets`
    * must be (doc, shingle) DISTINCT rows. The candidate set is small by
    * construction → broadcast to both shingle joins.
    */
  def jaccardOnCandidates(cands: DataFrame, shingleSets: DataFrame,
                          docCol: String): DataFrame = {
    val sizes = shingleSets.groupBy(col(docCol)).agg(count(lit(1)).as("n"))
    // common shingles via join on the shingle value, candidates broadcast
    val shA = shingleSets.select(col(docCol).as("doc_a"), col("shingle"))
    val shB = shingleSets.select(col(docCol).as("doc_b"), col("shingle"))
    val common = broadcast(cands).join(shA, Seq("doc_a")).join(shB, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    cands
      .join(common, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnRenamed(docCol, "doc_a").withColumnRenamed("n", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed(docCol, "doc_b").withColumnRenamed("n", "n_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("n_a") + col("n_b") - coalesce(col("n_common"), lit(0L))), 6).as("jaccard"))
  }

  /** 32-bit SimHash over the distinct token set: bit i is the sign of the
    * sum over tokens of ±1 by the parity of hex digit i of md5(token).
    * Returns (doc, simhash-bitstring).
    */
  def simhash(df: DataFrame, docCol: String, textCol: String): DataFrame = {
    // odd hex digits have parity bit 1
    val toks = df.select(col(docCol), explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
      .withColumn("i", explode(sequence(lit(0), lit(31))))
      .withColumn("contrib",
        when(expr("substr(h, i + 1, 1)")
            .isInCollection(Seq("1", "3", "5", "7", "9", "b", "d", "f")),
          lit(1)).otherwise(lit(-1)))
    toks
      .groupBy(col(docCol), col("i"))
      .agg(sum(col("contrib")).as("s"))
      .withColumn("bit", when(col("s") >= 0, lit("1")).otherwise(lit("0")))
      .groupBy(col(docCol))
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("i"), col("bit")))),
          x => x.getField("bit"))).as("simhash"))
  }
}
