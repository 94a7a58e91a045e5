package graft.ops

import graft.{GraftSession, QueryPack}
import graft.operators.{EmbeddingOps, MultimodalOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline pack over the `documents` and `embeddings`
  * corpora: deduplication (exact, MinHash+LSH, SimHash), similarity search
  * (brute-force + bucketed ANN), text analysis (tf-idf, corpus stats,
  * corpus-driven language ID, token counting) and a multimodal binary-column
  * stub.
  *
  * Scale discipline (the whole point at 100 TB):
  *  - near-dup candidates come from the banded-LSH equi-join, NEVER an
  *    all-pairs comparison; the exact-Jaccard pass touches candidates only.
  *  - ANN search touches one bucket per query; brute force exists as the
  *    small-query-set baseline with the query side broadcast.
  *  - everything else is explode → groupBy (map-side combined) or top-k
  *    (TakeOrderedAndProject, no global sort).
  */
object PipelinePack extends QueryPack {

  private def docs(s: SparkSession, d: String) = GraftSession.table(s, d, "documents")
  private def embs(s: SparkSession, d: String) = GraftSession.table(s, d, "embeddings")

  // LSH configuration: 8 permutations × 4 bands of 2 rows; buckets larger
  // than MaxBucket are dropped before pair enumeration (mirrored in the
  // DuckDB oracle, so the cap is part of the checked semantics)
  private val NumPerms = 8
  private val RowsPerBand = 2
  private val MaxBucket = 100
  // tighter cap for the degenerate-corpus query: the 2001-member boilerplate
  // cluster must trip it
  private val DegenerateCap = 50
  private val DegenerateClones = 2000

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // exact dedup over the content fingerprint (normalized-text md5):
    // one shuffle on the hash, corpus-level summary
    "q_dedup_exact" -> ((s, d) => {
      docs(s, d)
        .select(TextOps.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_groups"),
          sum(when(col("n") > 1, 1).otherwise(0)).as("n_dup_groups"),
          sum(col("n") - 1).as("n_extra_docs"))
    }),

    // banded MinHash-LSH near-duplicate candidates + exact Jaccard on the
    // candidate set only. Signatures are computed map-side over per-doc
    // shingle ARRAYS (no (shingle × perm) explode+shuffle): one md5 per
    // shingle + an integer permutation family, and the (doc, sh, mh)
    // projection is SHARED between the LSH band join and the Jaccard pass —
    // the only shuffles left are the repartition barrier, the LSH bucket
    // join and the candidate distinct.
    "q_dedup_near" -> ((s, d) => {
      val sigs = TextOps.minhashSignatures(
        TextOps.shingleArrays(docs(s, d), "doc_id", "text", 3), "doc_id", NumPerms)
      val bands = TextOps.lshBandRows(sigs, "doc_id", RowsPerBand, NumPerms)
      val cands = TextOps.candidatePairs(bands, "doc_id", MaxBucket)
      TextOps.jaccardOnCandidates(cands, sigs, "doc_id")
    }),

    // the web-crawl degenerate case: a corpus where one boilerplate template
    // appears 2001× (every clone shares every LSH bucket with every other
    // clone — pair enumeration would be quadratic, ~2M pairs × 4 bands).
    // The bucket-size cap drops the cluster before the self-join; the
    // output is the surviving-pair summary PLUS what the cap dropped, so
    // the drop is part of the oracle-checked result, not a silent skip.
    "q_dedup_degenerate" -> ((s, d) => {
      val dd = docs(s, d).select(col("doc_id"), col("text"))
      val tmpl = dd.agg(min(col("doc_id")).as("doc_id")).join(dd, Seq("doc_id"))
        .select(col("text"))
      val clones = s.range(DegenerateClones.toLong)
        .select((col("id") + 1000000L).as("doc_id"))
        .crossJoin(broadcast(tmpl))
      val corpus = dd.unionByName(clones.select(col("doc_id"), col("text")))
      val sigs = TextOps.minhashSignatures(
        TextOps.shingleArrays(corpus, "doc_id", "text", 3), "doc_id", NumPerms)
      val bands = TextOps.lshBandRows(sigs, "doc_id", RowsPerBand, NumPerms)
      val pairs = TextOps.jaccardOnCandidates(
        TextOps.candidatePairs(bands, "doc_id", DegenerateCap), sigs, "doc_id")
      val dropped = TextOps.oversizedBuckets(bands, DegenerateCap)
      pairs
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)), lit(0L)).as("n_high"),
          min(col("jaccard")).as("min_j"),
          max(col("jaccard")).as("max_j"))
        .crossJoin(dropped.agg(count(lit(1)).as("n_dropped_buckets"),
          coalesce(max(col("bucket_n")), lit(0L)).as("max_dropped_bucket")))
    }),

    // exact cosine top-3 for a 5-query set, brute force baseline
    "q_knn_cosine" -> ((s, d) => {
      val e = embs(s, d)
      EmbeddingOps.knnBruteForce(e.filter(col("vec_id") < 5), e, "vec_id", "embedding", 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("vec_id"), col("cos_sim"))
    }),

    // bucketed ANN: best in-bucket neighbor for a 20-query set (sign-pattern
    // LSH, 8 hyperplanes → 256 buckets); queries whose bucket holds no other
    // vector produce no row (inner bucket join) — mirrored by the oracle
    "q_ann_bucket" -> ((s, d) => {
      val e = embs(s, d)
      EmbeddingOps.annBucketed(e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
          dim = 64, nGroups = 8)
        .select(col("query_id"), col("bucket"), col("n_candidates"),
          col("best_id"), col("best_sim"))
    }),

    // embedding-cosine near-duplicates: bucketed pair generation (shared
    // sign-bucket only), threshold on the rounded similarity
    "q_embed_near_dup" -> ((s, d) => {
      EmbeddingOps.nearDupPairs(embs(s, d), "vec_id", "embedding",
        dim = 64, nGroups = 8, threshold = 0.3)
    }),

    // the full curation funnel in ONE declarative DAG — quality filter →
    // exact dedup (first doc per content fingerprint) → near-dup removal
    // (drop the higher doc_id of every LSH-confirmed pair with Jaccard ≥
    // 0.5) → per-source survivor stats. The real pre-training pipeline
    // shape: every stage is the oracle-checked operator above, composed.
    "q_curation" -> ((s, d) => {
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      val w = TextOps.tokens(col("text"))
      val quality = docs(s, d).select(col("doc_id"), col("source"), col("text"),
          size(w).as("n_tok"),
          (size(filter(w, t => array_contains(stop, t))).cast("double") /
            size(w)).as("stop_ratio"))
        .filter(col("n_tok") >= 30 && col("stop_ratio") >= 0.01)
      // first-doc-per-fingerprint via min_by: one map-side-combined
      // aggregation instead of a window sort over every partition
      val keepExact = quality
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min_by(struct(col("doc_id"), col("source"), col("text"),
          col("n_tok")), col("doc_id")).as("r"))
        .select(col("r.doc_id"), col("r.source"), col("r.text"), col("r.n_tok"))
      val sigs = TextOps.minhashSignatures(
        TextOps.shingleArrays(keepExact, "doc_id", "text", 3), "doc_id", NumPerms)
      val bands = TextOps.lshBandRows(sigs, "doc_id", RowsPerBand, NumPerms)
      val dupB = TextOps.jaccardOnCandidates(
          TextOps.candidatePairs(bands, "doc_id", MaxBucket), sigs, "doc_id")
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_b").as("doc_id")).distinct()
      keepExact.join(dupB, Seq("doc_id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_tok")).cast("long").as("total_tokens"))
    }),

    // Gopher-style repetition signals (the pre-training quality rules that
    // target boilerplate/spam): duplicate-token fraction and duplicate-
    // 3-gram fraction per source. Ratios are computed from SUMMED integer
    // numerators/denominators (one division on identical longs in both
    // engines) — never averaged per-doc doubles, which would reopen the
    // rounding-midpoint class.
    "q_repetition" -> ((s, d) => {
      val w = TextOps.tokens(col("text"))
      val perDoc = docs(s, d)
        .select(col("source"), w.as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("source"),
          size(col("w")).as("n_tok"),
          size(array_distinct(col("w"))).as("n_tok_d"),
          TextOps.shinglesOf(col("w"), 3).as("sh3"))
        .select(col("source"), col("n_tok"), col("n_tok_d"),
          size(col("sh3")).as("n_3g"),
          size(array_distinct(col("sh3"))).as("n_3g_d"))
      perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        round(lit(1.0) - sum(col("n_tok_d")).cast("double") /
          sum(col("n_tok")), 6).as("dup_tok_frac"),
        round(lit(1.0) - sum(col("n_3g_d")).cast("double") /
          sum(col("n_3g")), 6).as("dup_3gram_frac"))
    }),

    // PII scrubbing (the redaction pass every released corpus runs):
    // synthetic emails planted on doc_id % 7 == 0, then counted and
    // redacted; per-source counts + bytes removed. Integer outputs only.
    "q_pii_scrub" -> ((s, d) => {
      val emailRe = "[a-z0-9]+@[a-z0-9.]+[a-z]"
      val withPii = docs(s, d).withColumn("text2",
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com now"))).otherwise(lit(""))))
      withPii.select(col("source"),
          regexp_count(col("text2"), lit(emailRe)).as("n_pii"),
          (length(col("text2")) -
            length(regexp_replace(col("text2"), emailRe, "<EMAIL>"))).as("removed"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_pii")).cast("long").as("n_pii"),
          sum(col("removed")).cast("long").as("bytes_removed"))
    }),

    // corpus tf-idf: top-20 terms by summed tf·idf, deterministic tiebreak
    "q_tfidf_top_terms" -> ((s, d) => {
      val dd = docs(s, d)
      val n = dd.agg(countDistinct(col("doc_id")).as("n_docs"))
      val toks = dd.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      toks.groupBy("term")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .orderBy(col("tfidf").desc, col("term").asc)
        .limit(20)
        .select("term", "tf", "df", "tfidf")
    }),

    // per-language corpus statistics: doc count, mean token count, mean
    // type-token ratio, mean token length
    "q_text_stats" -> ((s, d) => {
      val w = TextOps.tokens(col("text"))
      val perDoc = docs(s, d).select(col("lang"),
        size(w).cast("double").as("n_tok"),
        (size(array_distinct(w)).cast("double") / size(w)).as("ttr"),
        (aggregate(w, lit(0), (acc, t) => acc + length(t)).cast("double") / size(w)).as("tok_len"))
      perDoc.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_tok")), 6).as("avg_tokens"),
        round(avg(col("ttr")), 6).as("avg_ttr"),
        round(avg(col("tok_len")), 6).as("avg_tok_len"))
    }),

    // corpus-driven language ID: top-8 marker tokens per language, docs
    // classified by largest marker overlap (tie → lexicographic lang),
    // output = confusion counts
    "q_lang_id" -> ((s, d) => {
      val dd = docs(s, d)
      val langToks = dd.select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      val markers = langToks
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("n").desc, col("tok").asc)))
        .filter(col("rn") <= 8)
        .select(col("lang").as("cand_lang"), col("tok"))
      val docToks = dd.select(col("doc_id"), col("lang"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      val scores = docToks.join(broadcast(markers), Seq("tok"))
        .groupBy("doc_id", "lang", "cand_lang").agg(count(lit(1)).as("score"))
      val predicted = scores
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand_lang").asc)))
        .filter(col("rn") === 1)
      predicted.groupBy(col("lang"), col("cand_lang").as("predicted"))
        .agg(count(lit(1)).as("n"))
    }),

    // winnowing rolling-hash fingerprints (Schleimer et al. SIGMOD'03):
    // per-source fingerprint instance/unique counts over the whole corpus
    "q_fingerprint" -> ((s, d) => {
      val fps = TextOps.winnowFingerprints(docs(s, d), "doc_id", "text")
      // explode_outer on purpose: a plain explode makes the optimizer INFER
      // size(fps) > 0 (InferFiltersFromGenerate) and push it into the scan
      // with the whole winnow expression inlined — re-evaluating the
      // normalized text per lambda element (measured: hangs the query).
      // fps is never empty here (docs are pre-filtered to >= k+w-1 chars),
      // and the cheap isNotNull filter keeps the semantics identical.
      fps.join(docs(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"), col("doc_id"), explode_outer(col("fps")).as("fp"))
        .filter(col("fp").isNotNull)
        .groupBy("source")
        .agg(count(lit(1)).as("n_fp"),
          countDistinct(col("fp")).as("n_unique_fp"),
          countDistinct(col("doc_id")).as("n_docs"))
    }),

    // SimHash banded search: 32-bit signatures split into 4 bands of 8 bits;
    // per band: bucket count and total within-bucket pair count
    "q_simhash_bands" -> ((s, d) => {
      val sh = TextOps.simhash(docs(s, d), "doc_id", "text")
      sh.withColumn("band", explode(sequence(lit(0L), lit(3L))))
        .withColumn("bv", expr("substr(simhash, band * 8 + 1, 8)"))
        .groupBy("band", "bv").agg(count(lit(1)).as("n"))
        .groupBy("band").agg(
          count(lit(1)).as("n_buckets"),
          sum(col("n") * (col("n") - 1) / 2).cast("long").as("n_pairs"))
    }),

    // token counting per source: whitespace tokens vs BPE-ish regex tokens,
    // plus a stopword-ratio quality score
    "q_token_count" -> ((s, d) => {
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      val w = TextOps.tokens(col("text"))
      val perDoc = docs(s, d).select(col("source"),
        size(w).as("ws_tok"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).as("re_tok"),
        (size(filter(w, t => array_contains(stop, t))).cast("double") / size(w)).as("stop_ratio"))
      perDoc.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tok")).as("ws_tokens"),
        sum(col("re_tok")).as("re_tokens"),
        round(avg(col("stop_ratio")), 6).as("avg_stop_ratio"))
    }),

    // C4-style document quality filter: length, stopword-ratio,
    // punctuation-ratio and mean-token-span heuristics combined into a
    // keep/drop decision, summarized per source — the pre-training corpus
    // cleaning pass
    "q_quality" -> ((s, d) => {
      val stop = array(Seq("the", "a", "of", "and", "to").map(lit): _*)
      val w = TextOps.tokens(col("text"))
      val perDoc = docs(s, d).select(col("source"),
        size(w).as("n_tok"),
        (size(filter(w, t => array_contains(stop, t))).cast("double") / size(w)).as("stop_ratio"),
        (regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") /
          length(col("text"))).as("punct_ratio"),
        (length(col("text")).cast("double") / size(w)).as("mean_tok_span"))
      perDoc
        .withColumn("keep",
          col("n_tok") >= 30 && col("stop_ratio") >= 0.01 &&
            col("punct_ratio") <= 0.2 && col("mean_tok_span") <= 12.0)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1).otherwise(0)).as("n_kept"),
          round(avg(col("punct_ratio")), 6).as("avg_punct"),
          round(avg(col("stop_ratio")), 6).as("avg_stop"))
    }),

    // multimodal frame sampling: payloads treated as 64-byte frames, every
    // 4th frame emitted as a row (the video-pipeline fan-out shape; decode
    // stays stubbed) — per-source frame counts and byte totals
    "q_frame_sample" -> ((s, d) => {
      val packed = MultimodalOps.packBinary(docs(s, d), "doc_id", "text")
        .join(docs(s, d).select(col("doc_id").cast("long").as("id"), col("source")),
          Seq("id"))
      MultimodalOps.frameSampleStub(packed, frameBytes = 64, everyN = 4)
        .groupBy("source")
        .agg(count(lit(1)).as("n_frames"),
          sum(col("frame_len")).cast("long").as("frame_bytes"))
    }),

    // multimodal binary columns: payload + metadata with a STUBBED decode
    // (deterministic fake dimensions from byte length)
    "q_multimodal" -> ((s, d) => {
      val packed = MultimodalOps.packBinary(docs(s, d), "doc_id", "text")
        .join(docs(s, d).select(col("doc_id").cast("long").as("id"), col("source")),
          Seq("id"))
      val decoded = MultimodalOps.decodeStubExprs(packed)
      decoded.groupBy("source").agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        sum(col("width").cast("long") * col("height")).cast("long").as("total_pixels"))
    })
  )

  /** DuckDB CTE chain mirroring the banded-MinHash LSH pipeline over a
    * relation `src(doc_id, text)`: defines d, s, h, sigs, bands, ok, cand, j
    * — bit-for-bit the arithmetic of TextOps.minhashSignatures/lshBandRows/
    * candidatePairs(cap)/jaccardOnCandidates, INCLUDING the bucket-size cap
    * (buckets with more than `cap` members produce no candidate pairs; the
    * cap filter is applied to one join side, sufficient for an inner
    * equi-join — same as the Spark side).
    */
  private def lshCtes(src: String, cap: Int): String =
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       s AS (SELECT doc_id,
                    list_distinct(list_transform(range(1, len(w) - 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
             FROM d WHERE len(w) >= 3),
       h AS (SELECT doc_id, sh,
                    list_transform(sh, x ->
                      ('0x' || substr(md5(x), 1, 15))::BIGINT) AS h60
             FROM s),
       sigs AS (SELECT doc_id, sh,
                       list_transform(range(0, $NumPerms), p ->
                         list_min(list_transform(h60, x ->
                           ((x % 2147483647) * ((1103515245 * (p + 1)) % 2147483647)
                            + ((12345 * (p + 7919)) % 2147483647)) % 2147483647))) AS mh
                FROM h),
       bands AS (SELECT doc_id, b.band,
                        array_to_string(list_transform(
                          mh[b.band*$RowsPerBand+1 : b.band*$RowsPerBand+$RowsPerBand],
                          x -> x::VARCHAR), ',') AS sig
                 FROM sigs CROSS JOIN
                      (SELECT unnest(range(0, ${NumPerms / RowsPerBand})) AS band) b),
       ok AS (SELECT band, sig FROM bands GROUP BY band, sig
              HAVING count(*) > 1 AND count(*) <= $cap),
       cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM (SELECT bands.doc_id, bands.band, bands.sig
                      FROM bands JOIN ok USING (band, sig)) a
                JOIN bands b
                  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
       j AS (SELECT c.doc_a, c.doc_b,
                    len(list_intersect(sa.sh, sb.sh)) AS n_common,
                    len(sa.sh) AS n_a, len(sb.sh) AS n_b
             FROM cand c
             JOIN sigs sa ON sa.doc_id = c.doc_a
             JOIN sigs sb ON sb.doc_id = c.doc_b)"""

  // DuckDB mirrors. Shared fragments:
  private def dotCos(qe: String, e: String): String =
    s"""round(
        list_sum(list_transform(range(1, len($e) + 1), i -> $qe[i]::DOUBLE * $e[i]::DOUBLE)) /
        (sqrt(list_sum(list_transform(range(1, len($qe) + 1), i -> $qe[i]::DOUBLE * $qe[i]::DOUBLE))) *
         sqrt(list_sum(list_transform(range(1, len($e) + 1), i -> $e[i]::DOUBLE * $e[i]::DOUBLE)))), 6)"""

  private val bucketExpr: String =
    (0 until 8).map { g =>
      s"(CASE WHEN list_sum(list_transform(embedding[${g * 8 + 1}:${g * 8 + 8}], x -> x::DOUBLE)) >= 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  override def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """WITH g AS (
           SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                  count(*) AS n
           FROM documents GROUP BY fp)
         SELECT sum(n)::BIGINT AS n_docs, count(*) AS n_groups,
                sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
                sum(n - 1)::BIGINT AS n_extra_docs
         FROM g""",
    "q_dedup_near" ->
      s"""WITH ${lshCtes("documents", MaxBucket)}
         SELECT doc_a, doc_b,
                round(n_common::DOUBLE / (n_a + n_b - n_common), 6) AS jaccard
         FROM j""",
    "q_dedup_degenerate" ->
      s"""WITH tmpl AS (SELECT text FROM documents
                        WHERE doc_id = (SELECT min(doc_id) FROM documents)),
         corpus AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT 1000000 + t.i AS doc_id, tmpl.text
                    FROM range(0, $DegenerateClones) t(i) CROSS JOIN tmpl),
         ${lshCtes("corpus", DegenerateCap)},
         p AS (SELECT doc_a, doc_b,
                      round(n_common::DOUBLE / (n_a + n_b - n_common), 6) AS jaccard
               FROM j),
         dropped AS (SELECT band, sig, count(*) AS bucket_n
                     FROM bands GROUP BY band, sig
                     HAVING count(*) > $DegenerateCap)
         SELECT (SELECT count(*) FROM p) AS n_pairs,
                (SELECT coalesce(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END), 0)::BIGINT
                 FROM p) AS n_high,
                (SELECT min(jaccard) FROM p) AS min_j,
                (SELECT max(jaccard) FROM p) AS max_j,
                (SELECT count(*) FROM dropped) AS n_dropped_buckets,
                (SELECT coalesce(max(bucket_n), 0)::BIGINT FROM dropped) AS max_dropped_bucket""",
    "q_knn_cosine" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         p AS (SELECT q.query_id, e.vec_id, ${dotCos("q.qe", "e.embedding")} AS cos_sim
               FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, vec_id ASC) AS rank FROM p)
         SELECT query_id, rank, vec_id, cos_sim FROM r WHERE rank <= 3""",
    "q_ann_bucket" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM b WHERE vec_id < 20),
         cand AS (SELECT q.query_id, q.bucket, b.vec_id,
                         ${dotCos("q.qe", "b.embedding")} AS cos_sim
                  FROM q JOIN b USING (bucket) WHERE b.vec_id != q.query_id),
         r AS (SELECT query_id, bucket, vec_id, cos_sim,
                      row_number() OVER (PARTITION BY query_id
                        ORDER BY cos_sim DESC, vec_id ASC) AS rn,
                      count(*) OVER (PARTITION BY query_id) AS n_candidates
               FROM cand)
         SELECT query_id, bucket, n_candidates, vec_id AS best_id, cos_sim AS best_sim
         FROM r WHERE rn = 1""",
    "q_embed_near_dup" ->
      s"""WITH b AS (SELECT vec_id, embedding, $bucketExpr AS bucket FROM embeddings),
         p AS (SELECT a.vec_id AS id_a, x.vec_id AS id_b,
                      ${dotCos("a.embedding", "x.embedding")} AS cos_sim
               FROM b a JOIN b x ON a.bucket = x.bucket AND a.vec_id < x.vec_id)
         SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.3""",
    "q_curation" ->
      s"""WITH q AS (
           SELECT doc_id, source, text,
                  len(string_split(text, ' ')) AS n_tok,
                  len(list_filter(string_split(text, ' '),
                      t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE /
                    len(string_split(text, ' ')) AS stop_ratio
           FROM documents),
         qk AS (SELECT doc_id, source, text, n_tok FROM q
                WHERE n_tok >= 30 AND stop_ratio >= 0.01),
         ex AS (SELECT *, row_number() OVER (
                  PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                  ORDER BY doc_id) AS rn
                FROM qk),
         kept AS (SELECT doc_id, source, text, n_tok FROM ex WHERE rn = 1),
         ${lshCtes("kept", MaxBucket)},
         dup AS (SELECT DISTINCT doc_b AS doc_id FROM j
                 WHERE round(n_common::DOUBLE / (n_a + n_b - n_common), 6) >= 0.5)
         SELECT source, count(*) AS n_kept, sum(n_tok)::BIGINT AS total_tokens
         FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dup)
         GROUP BY source""",
    "q_repetition" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         f AS (SELECT source, w FROM t WHERE len(w) >= 3),
         p AS (SELECT source,
                      len(w) AS n_tok, len(list_distinct(w)) AS n_tok_d,
                      list_transform(range(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS sh3
               FROM f),
         q AS (SELECT source, n_tok, n_tok_d, len(sh3) AS n_3g,
                      len(list_distinct(sh3)) AS n_3g_d FROM p)
         SELECT source, count(*) AS n_docs,
                round(1.0 - sum(n_tok_d)::DOUBLE / sum(n_tok), 6) AS dup_tok_frac,
                round(1.0 - sum(n_3g_d)::DOUBLE / sum(n_3g), 6) AS dup_3gram_frac
         FROM q GROUP BY source""",
    "q_pii_scrub" ->
      """WITH t AS (SELECT source,
                           text || (CASE WHEN doc_id % 7 = 0
                                    THEN ' contact user' || doc_id || '@example.com now'
                                    ELSE '' END) AS text2
                    FROM documents),
         p AS (SELECT source,
                      len(regexp_extract_all(text2,
                          '[a-z0-9]+@[a-z0-9.]+[a-z]')) AS n_pii,
                      length(text2) - length(regexp_replace(text2,
                          '[a-z0-9]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g')) AS removed
               FROM t)
         SELECT source, count(*) AS n_docs, sum(n_pii)::BIGINT AS n_pii,
                sum(removed)::BIGINT AS bytes_removed
         FROM p GROUP BY source""",
    "q_tfidf_top_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
         stats AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
                   FROM toks GROUP BY term)
         SELECT term, tf, df,
                round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
         FROM stats CROSS JOIN n
         ORDER BY tfidf DESC, term ASC LIMIT 20""",
    "q_text_stats" ->
      """WITH perdoc AS (
           SELECT lang,
                  len(string_split(text, ' '))::DOUBLE AS n_tok,
                  len(list_distinct(string_split(text, ' ')))::DOUBLE /
                    len(string_split(text, ' ')) AS ttr,
                  list_sum(list_transform(string_split(text, ' '), t -> length(t)))::DOUBLE /
                    len(string_split(text, ' ')) AS tok_len
           FROM documents)
         SELECT lang, count(*) AS n_docs,
                round(avg(n_tok), 6) AS avg_tokens,
                round(avg(ttr), 6) AS avg_ttr,
                round(avg(tok_len), 6) AS avg_tok_len
         FROM perdoc GROUP BY lang""",
    "q_lang_id" ->
      """WITH lt AS (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
         counts AS (SELECT lang, tok, count(*) AS n FROM lt GROUP BY lang, tok),
         markers AS (SELECT lang AS cand_lang, tok FROM (
             SELECT lang, tok, row_number() OVER (PARTITION BY lang
                    ORDER BY n DESC, tok ASC) AS rn FROM counts) WHERE rn <= 8),
         dt AS (SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS tok
                FROM documents),
         scores AS (SELECT dt.doc_id, dt.lang, m.cand_lang, count(*) AS score
                    FROM dt JOIN markers m ON dt.tok = m.tok
                    GROUP BY dt.doc_id, dt.lang, m.cand_lang),
         pred AS (SELECT doc_id, lang, cand_lang FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, cand_lang ASC) AS rn FROM scores) WHERE rn = 1)
         SELECT lang, cand_lang AS predicted, count(*) AS n
         FROM pred GROUP BY lang, predicted""",
    "q_fingerprint" -> {
      val pows = TextOps.winnowPows(8)
      val hashExpr = (0 until 8).map(j =>
        s"ord(substr(t, (i + $j)::INT, 1))::BIGINT * ${pows(j)}").mkString(" + ")
      s"""WITH d AS (SELECT doc_id, source,
                           trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
                    FROM documents),
         f AS (SELECT doc_id, source, t FROM d WHERE length(t) >= 11),
         h AS (SELECT doc_id, source,
                      list_transform(range(1, length(t) - 6), i ->
                        ($hashExpr) % 2147483647) AS hs
               FROM f),
         w AS (SELECT doc_id, source,
                      list_distinct(list_transform(range(1, len(hs) - 2), i ->
                        list_min(hs[i:i+3]))) AS fps
               FROM h),
         e AS (SELECT source, doc_id, unnest(fps) AS fp FROM w)
         SELECT source, count(*) AS n_fp,
                count(DISTINCT fp) AS n_unique_fp,
                count(DISTINCT doc_id) AS n_docs
         FROM e GROUP BY source"""
    },
    "q_simhash_bands" ->
      """WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                      FROM documents),
         bits AS (SELECT doc_id, i.i,
                         sum(CASE WHEN substr(md5(tok), i.i + 1, 1)
                                  IN ('1','3','5','7','9','b','d','f')
                                  THEN 1 ELSE -1 END) AS s
                  FROM toks CROSS JOIN (SELECT unnest(range(0, 32)) AS i) i
                  GROUP BY doc_id, i.i),
         sig AS (SELECT doc_id,
                        string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS simhash
                 FROM bits GROUP BY doc_id),
         bb AS (SELECT doc_id, b.band, substr(simhash, b.band * 8 + 1, 8) AS bv
                FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b),
         buckets AS (SELECT band, bv, count(*) AS n FROM bb GROUP BY band, bv)
         SELECT band, count(*) AS n_buckets,
                (sum(n * (n - 1) / 2))::BIGINT AS n_pairs
         FROM buckets GROUP BY band""",
    "q_token_count" ->
      """WITH perdoc AS (
           SELECT source,
                  len(string_split(text, ' ')) AS ws_tok,
                  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tok,
                  len(list_filter(string_split(text, ' '),
                      t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE /
                    len(string_split(text, ' ')) AS stop_ratio
           FROM documents)
         SELECT source, count(*) AS n_docs,
                sum(ws_tok)::BIGINT AS ws_tokens, sum(re_tok)::BIGINT AS re_tokens,
                round(avg(stop_ratio), 6) AS avg_stop_ratio
         FROM perdoc GROUP BY source""",
    "q_quality" ->
      """WITH perdoc AS (
           SELECT source,
                  len(string_split(text, ' ')) AS n_tok,
                  len(list_filter(string_split(text, ' '),
                      t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE /
                    len(string_split(text, ' ')) AS stop_ratio,
                  len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE /
                    length(text) AS punct_ratio,
                  length(text)::DOUBLE /
                    len(string_split(text, ' ')) AS mean_tok_span
           FROM documents),
         f AS (SELECT *,
                      (n_tok >= 30 AND stop_ratio >= 0.01 AND
                       punct_ratio <= 0.2 AND mean_tok_span <= 12.0) AS keep
               FROM perdoc)
         SELECT source, count(*) AS n_docs,
                sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                round(avg(punct_ratio), 6) AS avg_punct,
                round(avg(stop_ratio), 6) AS avg_stop
         FROM f GROUP BY source""",
    "q_frame_sample" ->
      """WITH p AS (SELECT source, octet_length(text::BLOB) AS n
                    FROM documents WHERE octet_length(text::BLOB) > 0),
         f AS (SELECT source, n, unnest(range(0, (n + 63) // 64, 4)) AS fi
               FROM p)
         SELECT source, count(*) AS n_frames,
                sum(least(64, n - fi * 64))::BIGINT AS frame_bytes
         FROM f GROUP BY source""",
    "q_multimodal" ->
      """SELECT source, count(*) AS n,
                sum(octet_length(text::BLOB))::BIGINT AS total_bytes,
                sum((octet_length(text::BLOB) % 64 + 1)::BIGINT *
                    (octet_length(text::BLOB) % 48 + 1))::BIGINT AS total_pixels
         FROM documents GROUP BY source"""
  )
}
