package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split-assignment operators for training-data
  * pipelines — beyond the reference (xcube has no corpus layer), designed
  * for the 100 TB curation funnel alongside TextOps:
  *
  *  - every decision is a pure function of a per-row KEY hash (md5, the
  *    repo's engine-portable hash), never of `rand()` or row order — so
  *    re-runs, retries, different cluster sizes and different engines all
  *    produce the SAME split/sample, which is what keeps a validation set
  *    from silently leaking into train on a re-ingest;
  *  - every op is scan-shaped (per-row arithmetic + an optional broadcast
  *    join against a tiny config table): no shuffle, no window, no state.
  */
object SampleOps {

  /** 60-bit key hash: first 15 hex chars of md5, base-16 — DuckDB mirror
    * `('0x' || substr(md5(k), 1, 15))::BIGINT` (same idiom as TextOps).
    */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Assign each row to train/val/test by hash bucket (percentages sum to
    * ≤ 100; the remainder is test). Adding data never moves an existing
    * row between splits — the assignment depends only on the key.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  trainPct: Int, valPct: Int,
                  splitCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: $trainPct/$valPct")
    val bucket = keyHash(col(keyCol)) % 100
    df.withColumn(splitCol,
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic Bernoulli sample at `rate` — keep rows whose key hash
    * falls below rate · 2^60 (exact integer threshold: no double compare
    * at the boundary, so both engines keep the identical row set).
    */
  def sampleByRate(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(keyHash(col(keyCol)) < threshold(rate))

  /** rate → exact integer hash threshold (rate · 2^60). */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    (rate * (1L << 60)).toLong
  }

  /** Domain-mix sampling: down-sample each domain (e.g. `source`) at its
    * own rate from a small (domain → rate) config, re-balancing a crawl
    * toward a target mixture. The config is broadcast-joined (tiny table);
    * domains absent from the config are DROPPED (explicit mixture only).
    * Scan-shaped: the only non-map operator is the broadcast hash join.
    */
  def domainMix(df: DataFrame, keyCol: String, domainCol: String,
                rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cfg = rates.toSeq.map { case (dom, r) => (dom, threshold(r)) }
      .toDF(domainCol, "__thresh")
    df.join(broadcast(cfg), domainCol)
      .filter(keyHash(col(keyCol)) < col("__thresh"))
      .drop("__thresh")
  }

  /** Deterministic export order: rows ordered by key hash — a stable
    * pseudorandom shuffle for training export (the full export is a range-
    * partitioned sort on the hash; [[exportHead]] exposes the top-k form,
    * which plans as TakeOrderedAndProject with no global sort).
    */
  def withExportOrder(df: DataFrame, keyCol: String,
                      orderCol: String = "export_order"): DataFrame =
    df.withColumn(orderCol, keyHash(col(keyCol)))

  /** First `k` rows of the deterministic export order (top-k, not a sort). */
  def exportHead(df: DataFrame, keyCol: String, k: Int): DataFrame =
    withExportOrder(df, keyCol).orderBy(col("export_order"), col(keyCol)).limit(k)

  /** Exactly min(k, |stratum|) rows per stratum, chosen by smallest key
    * hash — a deterministic stratified sample ("keep k docs per domain")
    * whose membership is a pure function of the keys present, like every
    * op here.
    *
    * Scale shape: the per-stratum selection is the bounded-heap top-k
    * aggregate ([[graft.functions.TopK.bottomK]]), NOT a row_number
    * window — strata are usually low-cardinality (domain, language), and
    * a window would sort each stratum's full membership inside one
    * partition. One map-side-combined shuffle on the strata key, k rows
    * retained per group per map task.
    */
  def stratifiedSample(df: DataFrame, strataCols: Seq[String], keyCol: String,
                       k: Int): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column")
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopK.bottomK(
        struct(keyHash(col(keyCol)).as("__h"),
          col(keyCol).cast("string").as("__k"), payload.as("__row")),
        k).as("__tk"))
      .select(explode(col("__tk.__row")).as("__row"))
      .select(df.columns.toIndexedSeq.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Concat-and-chunk sequence packing — the step that turns a curated
    * document set into fixed-length training sequences: documents are laid
    * end-to-end in a deterministic pseudorandom order and the token stream
    * is cut every `seqLen` tokens, so a document can span sequences and a
    * sequence usually holds several documents (GPT-style packing; no
    * padding except the tail of each shard).
    *
    * Sharded, not global: each row goes to `shard = keyHash % shards` and
    * packing happens independently per shard (order within shard = key
    * hash). One sequence never crosses shards. This is the standard scale
    * shape — a global concat order would be a single giant sort with a
    * serial cumulative sum, while per-shard packing is embarrassingly
    * parallel (shards ≈ k · cores), costs one shuffle, and wastes at most
    * one tail sequence per shard. Determinism: the layout is a pure
    * function of the keys present — independent of cluster size, retries
    * and input order.
    *
    * Emits one row per (document × sequence it lands in): the shard, the
    * sequence index within the shard, `tok_in_seq` (how many of the doc's
    * tokens land in that sequence) and `tok_start` (the doc token offset
    * where that span starts). Rows with zero `tokensCol` are dropped.
    */
  def packSequences(df: DataFrame, keyCol: String, tokensCol: String,
                    seqLen: Int, shards: Int): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen")
    require(shards > 0, s"shards $shards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("__h"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__h", keyHash(col(keyCol)))
      .withColumn("shard", col("__h") % shards)
      .withColumn("__toks", col(tokensCol).cast("long"))
      .filter(col("__toks") > 0)
      .withColumn("__end", sum(col("__toks")).over(w))
      .withColumn("__start", col("__end") - col("__toks"))
      // all sequence indices this doc overlaps (cumulative counts are far
      // below 2^53, so the floor-divide is exact)
      .withColumn("seq_in_shard",
        explode(sequence(floor(col("__start") / seqLen).cast("long"),
          floor((col("__end") - 1) / seqLen).cast("long"))))
      .withColumn("tok_in_seq",
        least(col("__end"), (col("seq_in_shard") + 1) * seqLen) -
          greatest(col("__start"), col("seq_in_shard") * seqLen))
      .withColumn("tok_start",
        greatest(col("__start"), col("seq_in_shard") * seqLen) - col("__start"))
      .drop("__h", "__toks", "__end", "__start")
  }
}
