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

  /** Gopher document-quality rules (Rae et al. 2021, appendix A1 — the
    * standard pre-training heuristic set): per-document boolean columns
    * `r_words` (50 ≤ word count ≤ 100k), `r_word_len` (3 ≤ mean word
    * length ≤ 10), `r_symbols` (hash/ellipsis per word ≤ 0.1),
    * `r_bullets` (< 90% of lines start with a bullet), `r_ellipsis`
    * (< 30% of lines end with …), `r_alpha` (≥ 80% of words contain a
    * letter), `r_stop` (≥ 2 distinct required stop words), plus
    * `gopher_keep` = all of them.
    *
    * Every threshold is evaluated with CROSS-MULTIPLIED INTEGER arithmetic
    * (e.g. `10·symbols ≤ words` instead of `symbols/words ≤ 0.1`) so the
    * DuckDB oracle can mirror the rules bit-for-bit with no float
    * divergence — same discipline as the CCNet LM filter. Scan-shaped:
    * pure per-row expressions, no shuffle, no UDF.
    */
  def gopherRules(df: DataFrame, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val w = tokens(t)
    val nW = size(w).cast("long")
    val sumLen = aggregate(transform(w, x => length(x)),
      lit(0L), (acc, x) => acc + x)
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    // both ellipsis spellings count: ASCII '...' and Unicode '…' (U+2026 —
    // the form word processors emit; the Gopher paper's rule covers it)
    val nEll = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3 +
      (length(t) - length(regexp_replace(t, "…", "")))).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^(-|\\*|•)"))).cast("long")
    val nEllEnd = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("long")
    val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
    val stops = array(Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(lit): _*)
    val nStop = size(array_intersect(w, stops)).cast("long")
    df.withColumn("r_words", nW >= 50L && nW <= 100000L)
      .withColumn("r_word_len", sumLen >= nW * 3L && sumLen <= nW * 10L)
      .withColumn("r_symbols", (nHash + nEll) * 10L <= nW)
      .withColumn("r_bullets", nBullet * 10L < nLines * 9L)
      .withColumn("r_ellipsis", nEllEnd * 10L < nLines * 3L)
      .withColumn("r_alpha", nAlpha * 5L >= nW * 4L)
      .withColumn("r_stop", nStop >= 2L)
      .withColumn("gopher_keep",
        col("r_words") && col("r_word_len") && col("r_symbols") &&
          col("r_bullets") && col("r_ellipsis") && col("r_alpha") && col("r_stop"))
  }

  /** RAG-style overlapping token windows: one row per (document, window),
    * windows starting every `stride` tokens and holding up to `width`
    * tokens (the final window may be shorter). Scan-shaped — explode plus
    * per-row arithmetic, no shuffle. Emits `win_id`, `win_start`,
    * `win_len` and the re-joined `win_text`; rows with an empty token
    * array are dropped.
    *
    * Window starts stop at the first window that reaches the document end
    * (last start = max(0, ceil((n-width)/stride)·stride)): a start past
    * n-width would emit a short tail wholly contained in the previous
    * window — duplicated retrieval content for a RAG corpus.
    */
  def chunkWindows(df: DataFrame, textCol: String,
                   width: Int, stride: Int): DataFrame = {
    require(width > 0, s"width $width")
    require(stride > 0 && stride <= width, s"stride $stride vs width $width")
    df.withColumn("__w", tokens(col(textCol)))
      .withColumn("__n", size(col("__w")))
      .filter(col("__n") > 0)
      .withColumn("win_id",
        explode(sequence(lit(0), greatest(lit(0),
          // integer ceil((n-width)/stride); negative when n <= width → 0
          floor((col("__n") - width + (stride - 1)) / stride)).cast("int"))))
      .withColumn("win_start", col("win_id") * stride)
      .withColumn("win_len", least(lit(width), col("__n") - col("win_start")))
      .withColumn("win_text",
        concat_ws(" ", slice(col("__w"), col("win_start") + 1, col("win_len"))))
      .drop("__w", "__n")
  }

  /** Exact-substring duplicate spans (the Lee et al. 2021 "Deduplicating
    * Training Data" signal, re-expressed relationally): every n-token
    * window of every document is hashed; a window whose hash occurs in ≥ 2
    * DISTINCT documents is a duplicated span. Returns one row per
    * duplicated (doc, window): `doc_id`, `pos` (0-based token offset),
    * `h` (the span hash), `n_docs` (how many docs share it).
    *
    * Scale shape: windows are per-row explode arithmetic; the only
    * shuffles are the hash-keyed distinct-doc count (map-side combined)
    * and the hash equi-join back — never a doc×doc pair join, so a span
    * shared by a million documents costs one aggregate row, not 10^12
    * pairs. The suffix-array construction of the paper is replaced by the
    * window hash join, which is the standard shuffle-friendly equivalent.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val grams = spanGrams(df, idCol, textCol, n)
    val shared = grams.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
    grams.join(shared, Seq("h"))
  }

  /** The (doc_id, pos, h) window-hash table behind [[repeatedSpans]] /
    * [[removeRepeatedSpans]].
    */
  private def spanGrams(df: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    require(n >= 2, s"span length $n")
    df.withColumn("__w", tokens(col(textCol)))
      .filter(size(col("__w")) >= n)
      // one fused native pass (graft.functions.SpanHash60): each window's
      // md5 runs over the assembled token bytes directly — the shingle
      // STRING was materialized through an interpreted HOF transform only
      // to be hashed and discarded (bit-identical; SpanHash60Spec pins it
      // against the old shinglesOf+conv(md5) tree).
      // posexplode_OUTER: the plain generator would get an optimizer-
      // inferred size()>0 filter that re-evaluates the whole hash
      // array per row (InferFiltersFromGenerate — same pathology as the
      // minhash path, documented at shinglesOf); the ≥ n token filter
      // above already guarantees non-empty arrays
      .select(col(idCol).as("doc_id"),
        posexplode_outer(graft.functions.SpanHash60.col(col("__w"), n))
          .as(Seq("pos", "h")))
  }

  /** ExactSubstr REMOVAL (the second half of Lee et al. 2021 §4.1): every
    * duplicated n-token span keeps its FIRST corpus occurrence and every
    * other occurrence is deleted token-wise; surviving tokens are stitched
    * back in order. Returns one row per input document:
    * (doc_id, clean_text, n_tokens) — fully-duplicated documents come
    * back with empty text.
    *
    * Scale shape: the first occurrence per span hash is a map-side-
    * combinable `min(struct(doc_id, pos))` aggregation + equi-join back —
    * NOT a `row_number` window, whose partition-local sort would funnel a
    * boilerplate span repeated across 10⁸ documents (license headers —
    * the exact thing this operator removes) into one partition. A
    * degenerate corpus where every document shares one span costs the
    * same one shuffle as a uniform corpus (AQE splits the skewed join
    * side). Deletion marks explode ONLY flagged occurrences (n token
    * indices each, distinct-folded), and ONLY documents with a deletion
    * are re-tokenized and reassembled — untouched documents pass through
    * without an explode, so the rebuild cost is proportional to
    * duplicated volume, not corpus volume. NOTE: rebuilt text is
    * single-space joined (tokens() semantics), like the rest of the
    * token pipeline.
    */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val grams = spanGrams(df, idCol, textCol, n)
    // ONE hash-keyed aggregation carries both the shared-span predicate
    // (distinct-doc count >= 2) and the first occurrence: lexicographic
    // min(struct) == the row_number-over-(doc_id, pos) winner, but
    // partial-aggregates on the map side — the hot span hash arrives at
    // the reducer as one pre-combined row per upstream partition, and the
    // gram subtree is computed twice total (agg + join), not four times
    val firsts = grams.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("__nd"),
        min(struct(col("doc_id"), col("pos"))).as("__first"))
      .filter(col("__nd") >= 2)
      .select("h", "__first")
    val marks = grams
      .join(firsts, Seq("h"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("__first"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + n - 1)).as("ti"))
      .distinct()
    val touchedIds = marks.select("doc_id").distinct()
    val touchedToks = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__w"))
      .join(touchedIds, Seq("doc_id"))
      .select(col("doc_id"), posexplode(col("__w")).as(Seq("ti", "tk")))
    val rebuilt = touchedToks
      .join(marks, Seq("doc_id", "ti"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("ti"), col("tk")))),
          s => s.getField("tk")), " ").as("clean_text"),
        count(lit(1)).as("n_tokens"))
    // fully-duplicated docs lose every token — emit them with empty text
    val touched = touchedIds
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    val untouched = df
      .select(col(idCol).as("doc_id"), col(textCol).as("clean_text"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(touchedIds, Seq("doc_id"), "left_anti")
    untouched.unionByName(touched)
  }

  /** Word n-gram shingles as strings; empty array when the doc is shorter
    * than n tokens.
    *
    * PERFORMANCE: pass a MATERIALIZED token-array column (`shinglesOf`
    * via `shingleArrays`), not an inline `split(...)` expression, when the
    * array is consumed per element. Inside a higher-order-function lambda a
    * non-attribute argument is re-evaluated on every element access —
    * an inline split makes this O(tokens²) per doc (measured 10× the whole
    * near-dup query at sf0.1).
    */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Shingles from a token-array column `w`. */
  def shinglesOf(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      .otherwise(array())

  /** 60-bit integer MinHash basis for permutation `perm`: the first 15 hex
    * chars of md5(shingle + "#" + perm) parsed base-16. Numerically identical
    * in DuckDB via `('0x' || substr(md5(..), 1, 15))::BIGINT`, but the
    * shuffle rows carry longs instead of 32-char strings and min() is an
    * integer comparator — ~4× narrower than the hex-string form.
    *
    * Kept for the one-md5-per-(shingle,perm) form; the production signature
    * path ([[minhashSignatures]]) hashes each shingle ONCE ([[hash60]]) and
    * derives the per-permutation values with the integer family
    * [[permuted]] — numPerms× less hashing.
    */
  def minhash64(shingle: Column, perm: Column): Column =
    conv(substring(md5(concat(shingle, lit("#"), perm.cast("string")).cast("binary")),
      1, 15), 16, 10).cast("long")

  /** Modulus of the universal-hash permutation family: 2^31 − 1 (prime).
    * Keeping operands below 2^31 bounds every product under 2^62, so the
    * arithmetic is overflow-free int64 in both Spark and DuckDB.
    * The single definition (with the per-permutation constants) lives in
    * [[graft.functions.MinhashSig]], which the signature hot path uses.
    */
  val PermModulus: Long = graft.functions.MinhashSig.PermModulus

  private def permA(p: Int): Long = graft.functions.MinhashSig.permA(p)
  private def permB(p: Int): Long = graft.functions.MinhashSig.permB(p)

  /** 60-bit base hash of a shingle: first 15 hex chars of md5, base-16.
    * DuckDB mirror: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** p-th permuted value of a base hash: `((h mod M) * A_p + B_p) mod M`
    * with the LCG-derived per-permutation constants above. One md5 plus
    * numPerms integer ops per shingle replaces numPerms md5s — the hash cost
    * of the signature pass drops by ~numPerms×.
    */
  def permuted(h: Column, p: Int): Column =
    ((h % PermModulus) * permA(p) + permB(p)) % PermModulus

  /** Per-doc DISTINCT shingle arrays: (doc, sh). Docs shorter than the
    * shingle width drop out (empty set — can never be a near-dup candidate).
    * This is the zero-shuffle basis for both the signatures and the exact
    * Jaccard pass: everything is computed per row, map-side, until the LSH
    * bucket join itself.
    */
  def shingleArrays(df: DataFrame, docCol: String, textCol: String,
                    shingleN: Int): DataFrame =
    // repartition first: corpus files often arrive as few coarse splits
    // (one parquet file = one input partition), which would serialize the
    // per-row higher-order-function work onto one core. The partition count
    // is EXPLICIT on purpose: AQE sizes coalescing by shuffle BYTES, and a
    // small-bytes/high-CPU stage (shingling is interpreted HOF work) would
    // be coalesced back onto one core; an explicit count opts this exchange
    // out of AQE coalescing.
    // Then two-step projection on purpose: `w` must be a materialized
    // attribute before the per-element shingle transform reads it (see
    // shingles doc); CollapseProject keeps them separate because `w` is
    // expensive and multiply-referenced.
    // the short-doc filter tests the TOKEN COUNT, not size(sh) > 0, although
    // they are equivalent (a doc yields shingles iff it has >= n tokens):
    // a filter on `sh` would be pushed down into the scan with the whole
    // shingle expression INLINED — split(text) re-evaluated per lambda
    // element, O(tokens²) per doc on the unparallelized input (measured as
    // ~60% of the whole near-dup query). The token-count form pushes down
    // as one cheap split per row.
    // shingle construction + distinct fused into one native pass
    // (graft.functions.DistinctShingles) — the HOF transform form walked
    // the token array per window through interpreted per-element eval,
    // then array_distinct re-walked the result (bit-identical;
    // DistinctShinglesSpec pins it against the old tree)
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(docCol))
      .select(col(docCol), tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= shingleN)
      .select(col(docCol),
        graft.functions.DistinctShingles.col(col("w"), shingleN).as("sh"))

  /** MinHash signature array (`numPerms` longs) per doc, computed entirely
    * WITHIN the doc row — no (shingle × perm) explode, no groupBy shuffle:
    * each shingle is md5-hashed ONCE ([[hash60]]), and the per-permutation
    * minima come from the integer family [[permuted]] over that base-hash
    * array. Per doc: |sh| md5s + numPerms·|sh| integer ops, zero shuffles.
    *
    * Returns (doc, sh, mh) — the shingle array rides along so the exact
    * Jaccard pass downstream shares this one projection instead of
    * recomputing the shingles per join side.
    */
  def minhashSignatures(withSh: DataFrame, docCol: String, numPerms: Int): DataFrame =
    // one fused native pass (graft.functions.MinhashSig): md5 each shingle
    // once (bytes, no hex round-trip) and fold all numPerms minima in the
    // same loop. Replaces the interpreted HOF tree
    // array(array_min(transform(transform(sh, hash60), permuted)) × P),
    // which walked the array P+1 times through per-element expression
    // eval — bit-identical by construction (MinhashSigSpec pins it
    // against the old tree, including null/empty-array edges).
    withSh.select(col(docCol), col("sh"),
      graft.functions.MinhashSig.col(col("sh"), numPerms).as("mh"))

  /** LSH band rows from signature arrays: one (doc, band, sig) row per band,
    * sig = comma-joined minhash slice. Map-side explode of numPerms/rowsPerBand
    * small rows per doc.
    */
  def lshBandRows(sigs: DataFrame, docCol: String, rowsPerBand: Int,
                  numPerms: Int): DataFrame = {
    require(numPerms % rowsPerBand == 0,
      s"numPerms ($numPerms) must be a multiple of rowsPerBand ($rowsPerBand): " +
        "trailing permutations would be silently excluded from banding")
    val nBands = numPerms / rowsPerBand
    sigs.select(col(docCol), col("mh"))
      .withColumn("band", explode(sequence(lit(0), lit(nBands - 1))))
      .select(col(docCol), col("band"),
        array_join(transform(
          slice(col("mh"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")), ",").as("sig"))
  }

  /** Default LSH bucket-size cap for [[candidatePairs]]. The self-join on a
    * bucket of n members emits n·(n−1)/2 pairs — quadratic in the largest
    * bucket. Real web corpora have degenerate buckets (millions of docs
    * sharing one boilerplate template); capping bucket size is the standard
    * LSH practice and an exact no-op below the cap. A dropped bucket means
    * those docs were near-identical at MinHash resolution anyway — callers
    * doing dedup should treat an oversized bucket as one duplicate cluster
    * (see [[oversizedBuckets]]) rather than enumerate its pairs.
    */
  val DefaultMaxBucket: Int = 10000

  /** (band, sig, bucket_n) of buckets the cap in [[candidatePairs]] drops —
    * for logging/auditing what pair enumeration skipped.
    */
  def oversizedBuckets(bands: DataFrame, maxBucket: Int): DataFrame =
    bands.groupBy("band", "sig").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Candidate near-duplicate pairs: docs sharing any (band, signature)
    * bucket. Equi-join on the bucket key — the scale-safe core of LSH.
    *
    * Buckets with more than `maxBucket` members are dropped BEFORE the
    * self-join (one map-side-combined count aggregation; the filter is
    * applied to one join side only, which is sufficient for an inner
    * equi-join). Singleton buckets are pruned by the same aggregation —
    * they cannot produce a pair, and on a normal corpus they are the vast
    * majority of bucket keys.
    */
  def candidatePairs(bands: DataFrame, docCol: String,
                     maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val ok = bands.groupBy("band", "sig").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > 1 && col("bucket_n") <= maxBucket)
      .select("band", "sig")
    val a = bands.join(ok, Seq("band", "sig"))
      .select(col(docCol).as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col(docCol).as("doc_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** CROSS-corpus candidate pairs — the incremental-ingest shape: match a
    * NEW batch against an EXISTING corpus without re-deduping the corpus
    * against itself. Pairs are (doc_a = new, doc_b = corpus) sharing any
    * (band, sig) bucket; the bucket cap applies to the CORPUS side (the
    * unbounded one — a boilerplate bucket there would multiply every new
    * doc that touches it), counted with one map-side-combined aggregation
    * before the join, exactly like [[candidatePairs]]. No self-join, no
    * doc_a < doc_b convention (the id spaces are disjoint by contract).
    */
  def candidatePairsAgainst(newBands: DataFrame, corpusBands: DataFrame,
                            docCol: String,
                            maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val ok = corpusBands.groupBy("band", "sig")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select("band", "sig")
    corpusBands.join(ok, Seq("band", "sig"))
      .select(col(docCol).as("doc_b"), col("band"), col("sig"))
      .join(newBands.select(col(docCol).as("doc_a"), col("band"), col("sig")),
        Seq("band", "sig"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact shingle-set Jaccard for candidate pairs from the per-doc arrays:
    * two hash joins against the array table; the intersection is computed
    * per row with array_intersect, no shuffle after the joins. No broadcast
    * hint on purpose — the candidate set is unbounded on a degenerate corpus
    * (pre-cap it was quadratic in the largest bucket), so the join strategy
    * is left to AQE, which broadcasts when the runtime size actually fits.
    */
  def jaccardOnCandidates(cands: DataFrame, withSh: DataFrame,
                          docCol: String): DataFrame = {
    val a = withSh.select(col(docCol).as("doc_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(docCol).as("doc_b"), col("sh").as("sh_b"))
    cands.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        round(col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")), 6).as("jaccard"))
  }

  /** CONTAINMENT on candidates (Broder's asymmetric near-dup measure):
    * |A∩B| / |A| — catches a document embedded inside a longer one, which
    * symmetric Jaccard dilutes away. Same shape as
    * [[jaccardOnCandidates]]: two keyed joins back to the shingle arrays,
    * exact intersection on candidates only.
    */
  def containmentOnCandidates(cands: DataFrame, withSh: DataFrame,
                              docCol: String): DataFrame = {
    val a = withSh.select(col(docCol).as("doc_a"), col("sh").as("sh_a"))
    val b = withSh.select(col(docCol).as("doc_b"), col("sh").as("sh_b"))
    cands.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        round(col("n_common").cast("double") / size(col("sh_a")), 6)
          .as("containment_a"),
        round(col("n_common").cast("double") / size(col("sh_b")), 6)
          .as("containment_b"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the standard rolling-hash fingerprinting scheme):
    * character k-grams of the normalized text are hashed with a polynomial
    * rolling hash (base 257 mod 2^31−1, pure int64 arithmetic — exact in
    * any engine), then each length-`window` run of consecutive gram hashes
    * contributes its minimum; the doc's fingerprint set is the distinct
    * window minima. Everything is per-row column arithmetic — the only
    * shuffle a caller pays is whatever aggregation they run on the result.
    *
    * Returns (doc, fps: array<bigint>). Docs shorter than k+window−1 chars
    * drop out (no full window exists).
    */
  def winnowFingerprints(df: DataFrame, docCol: String, textCol: String,
                         k: Int = 8, window: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    EmbeddingOps.parallelized(df)
      .select(col(docCol), normalized(col(textCol)).as("t"))
      .filter(length(col("t")) >= k + window - 1)
      .select(col(docCol),
        ColumnBridge.column(graft.functions.WinnowFp(
          ColumnBridge.expression(col("t")), k, window)).as("fps"))
  }

  /** The relational HOF form of [[winnowFingerprints]] — O(L·k) interpreted
    * lambda evaluations per doc; kept for cross-checking the native O(L)
    * rolling-hash expression (their fingerprint SETS are identical because
    * both compute the same mod-M residues).
    */
  def winnowFingerprintsHof(df: DataFrame, docCol: String, textCol: String,
                            k: Int = 8, window: Int = 4): DataFrame = {
    val B = 257L
    val M = 2147483647L
    // B^(k-1-j) mod M for gram position j — Scala-computed constants shared
    // verbatim with the SQL oracle
    val pows: Seq[Long] = (0 until k).map { j =>
      var p = 1L
      (0 until (k - 1 - j)).foreach(_ => p = p * B % M)
      p
    }
    val base = EmbeddingOps.parallelized(df)
      .select(col(docCol), normalized(col(textCol)).as("t"))
      .filter(length(col("t")) >= k + window - 1)
    // materialize the char-code array once per row: each gram hash then
    // reads k ints by index instead of allocating k substring objects
    // (measured ~2× on the interpreted HOF path)
    val withCodes = base.select(col(docCol), length(col("t")).as("len"),
      transform(sequence(lit(1), length(col("t"))), p =>
        ascii(col("t").substr(p, lit(1))).cast("long")).as("codes"))
    // gram hashes: code_j·B^(k-1-j) products stay < 2^52, so one mod at
    // the end suffices and the arithmetic is overflow-free int64
    val withHs = withCodes.select(col(docCol),
      transform(sequence(lit(1), col("len") - (k - 1)), i =>
        (0 until k).map(j =>
          element_at(col("codes"), (i + lit(j)).cast("int")) * lit(pows(j)))
          .reduce(_ + _) % lit(M)).as("hs"))
    withHs.select(col(docCol),
      array_distinct(transform(sequence(lit(1), size(col("hs")) - (window - 1)), i =>
        array_min(slice(col("hs"), i, lit(window))))).as("fps"))
  }

  /** The rolling-hash power constants, exposed so the SQL oracle can embed
    * the identical literals.
    */
  def winnowPows(k: Int = 8): Seq[Long] = {
    val B = 257L; val M = 2147483647L
    (0 until k).map { j =>
      var p = 1L
      (0 until (k - 1 - j)).foreach(_ => p = p * B % M)
      p
    }
  }

  /** 32-bit SimHash over the distinct token set: bit i is the sign of the
    * sum over tokens of ±1 by the parity of hex digit i of md5(token).
    * Returns (doc, simhash-bitstring).
    */
  def simhash(df: DataFrame, docCol: String, textCol: String): DataFrame = {
    // SimHash is a pure function of one document's token set, so the whole
    // computation is a row-local projection: one md5 per distinct token
    // (materialized once in `hs`), then a 32-way ±1 fold via
    // aggregate/zip_with — no explode, no shuffle. The previous shape
    // (explode token × 32 bit-positions → groupBy(doc, i)) shuffled
    // 32 × |tokens| rows per document for what is per-row arithmetic.
    // Odd hex digits of the md5 have parity bit 1 (+1 contribution).
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
    EmbeddingOps.parallelized(df)
      .select(col(docCol),
        transform(array_distinct(tokens(col(textCol))),
          t => md5(t.cast("binary"))).as("hs"))
      // the old explode dropped token-less docs; keep that contract
      .filter(size(col("hs")) > 0)
      .select(col(docCol),
        aggregate(col("hs"), array_repeat(lit(0), 32),
          (acc, h) => zip_with(acc, sequence(lit(0), lit(31)), (a, i) =>
            a + when(h.substr(i + lit(1), lit(1)).isInCollection(oddHex),
              lit(1)).otherwise(lit(-1)))).as("sums"))
      .select(col(docCol),
        concat_ws("", transform(col("sums"),
          s => when(s >= 0, lit("1")).otherwise(lit("0")))).as("simhash"))
  }
}
