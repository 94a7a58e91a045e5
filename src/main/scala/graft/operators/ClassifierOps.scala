package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier over hashed bag-of-token features — the
  * GPT-3 / CCNet curation protocol (logistic regression scoring documents
  * against a "high-quality" target class), re-expressed as Spark
  * aggregations. The reference's curation story stops at rule-based
  * filters; LLM-scale pipelines pair those with a learned classifier, so
  * this is a beyond-reference first-class operator like the dedup family.
  *
  * Scale design (100 TB corpus, 1000 executors):
  *  - features are ONE explode + ONE map-side-combined groupBy per doc —
  *    scan-shaped, no joins; the hashed dimension bounds state (2^18
  *    buckets at real scale, 64 in the oracle query);
  *  - each training step is two map-side-combined shuffles (per-doc margin,
  *    per-bucket gradient); the weight vector lives on the driver (`dim`
  *    doubles) and ships to executors as a literal — never a join;
  *  - the margin uses the softsign sigmoid σ(m) = 0.5 + 0.5·m/(1+|m|)
  *    instead of exp: division/multiplication are correctly-rounded IEEE
  *    ops, so with integer weights the whole gradient step is reproducible
  *    BIT-FOR-BIT across engines and partitionings (DECIMAL gradient sums
  *    are order-independent) — `q_lr_step` oracle-checks it against DuckDB;
  *  - scoring is a scan + one groupBy(doc): stream-friendly, AQE-safe,
  *    deterministic under retries (pure hash arithmetic).
  */
object ClassifierOps {

  /** Sparse hashed features: one row per (doc, bucket) with the token
    * count; `label` is carried through (cast to int 0/1). Bucket =
    * [[TextOps.hash60]] of the token modulo `dim` — DuckDB-mirrorable as
    * `('0x' || substr(md5(tok), 1, 15))::BIGINT % dim`.
    */
  def hashedFeatures(df: DataFrame, docCol: String, textCol: String,
                     label: Column, dim: Int): DataFrame =
    df.select(col(docCol).as("__doc"), label.cast("int").as("__y"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__bucket", TextOps.hash60(col("__tok")) % dim)
      .groupBy("__doc", "__y", "__bucket")
      .agg(count(lit(1)).as("__cnt"))

  /** Per-document decision margin w·x over the sparse features. With
    * integral weights the per-doc sum is exact integer arithmetic in
    * doubles (magnitudes far below 2^53) and therefore order-independent.
    */
  def margin(features: DataFrame, weights: Seq[Double]): DataFrame =
    features
      .withColumn("__w",
        element_at(lit(weights.toArray), (col("__bucket") + 1).cast("int")))
      .groupBy("__doc", "__y")
      .agg(sum(col("__cnt") * col("__w")).as("__m"))

  /** Softsign-sigmoid prediction error σ(m) − y, built only from
    * correctly-rounded IEEE ops (+, −, ×, ÷, abs) so two engines fed the
    * same margins produce bit-identical errors.
    */
  private def softsignError(m: Column, y: Column): Column =
    lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m))) - y

  /** One logistic-regression gradient step: per-bucket
    * Σ_docs (σ(w·x) − y)·x_b, summed in DECIMAL so the result is
    * order-independent. Returns (bucket, n, grad) — `n` = docs touching
    * the bucket. Two map-side-combined shuffles; output is `dim` rows.
    */
  def gradient(features: DataFrame, weights: Seq[Double]): DataFrame = {
    val err = margin(features, weights)
      .select(col("__doc"), softsignError(col("__m"), col("__y")).as("__e"))
    features.join(err, Seq("__doc"))
      .groupBy(col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(sum((col("__e") * col("__cnt")).cast("decimal(28,12)")), 6)
          .cast("double").as("grad"))
  }

  /** Batch gradient-descent training loop. `features` should be cached by
    * the caller (each step re-reads it twice). The weight vector stays on
    * the driver; gradients come back as `dim` rows per step.
    */
  def train(features: DataFrame, dim: Int, steps: Int,
            learningRate: Double): Array[Double] = {
    val nDocs = features.select("__doc").distinct().count().toDouble
    var w = Array.fill(dim)(0.0)
    (0 until steps).foreach { _ =>
      val g = new Array[Double](dim)
      gradient(features, w.toSeq).collect().foreach { r =>
        g(r.getLong(0).toInt) = r.getDouble(2)
      }
      w = Array.tabulate(dim)(b => w(b) - learningRate * g(b) / nDocs)
    }
    w
  }

  /** Score + keep decision: margin > threshold. Scan-shaped (one groupBy
    * per doc, weights as a literal).
    */
  def score(features: DataFrame, weights: Seq[Double],
            threshold: Double = 0.0): DataFrame =
    margin(features, weights)
      .select(col("__doc").as("doc"), col("__y").as("label"),
        col("__m").as("margin"), (col("__m") > threshold).as("keep"))

  // ------------------------------------------------------- DSIR selection

  /** DSIR importance model (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): per hashed-token bucket, the
    * add-one-smoothed log probability ratio between a target-domain token
    * distribution and the raw-corpus distribution, QUANTIZED to integer
    * micro-nats. Quantization is the scale trick: the model pass is one
    * scan + one `dim`-row aggregation (collected to the driver — `dim`
    * longs), and scoring becomes an exact integer dot product, so per-doc
    * scores are bit-identical across engines, partitionings, and retries.
    *
    * `isTarget` marks rows of the target domain INSIDE the same corpus
    * scan (the usual DSIR setup scores raw data against a small trusted
    * target set); both distributions come from one explode + one
    * map-side-combined groupBy.
    */
  def dsirModel(df: DataFrame, textCol: String, isTarget: Column,
                dim: Int): Array[Long] = {
    val counts = df
      .select(isTarget.cast("int").as("__t"),
        explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__bucket", TextOps.hash60(col("__tok")) % dim)
      .groupBy("__bucket")
      .agg(count(lit(1)).as("nr"), sum(col("__t")).as("nt"))
      .collect()
    val nR = Array.fill(dim)(0L)
    val nT = Array.fill(dim)(0L)
    counts.foreach { r =>
      nR(r.getLong(0).toInt) = r.getLong(1)
      nT(r.getLong(0).toInt) = r.getLong(2)
    }
    val totR = nR.sum + dim
    val totT = nT.sum + dim
    Array.tabulate(dim) { b =>
      // exact integer products (< 2^53) then one correctly-rounded IEEE
      // division: both engines feed ln() the identical double
      val x = ((nT(b) + 1) * totR).toDouble / ((nR(b) + 1) * totT).toDouble
      val v = 1e6 * math.log(x)
      // ties away from zero, matching DuckDB round()
      (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
    }
  }

  /** Per-document DSIR importance score: Σ_tokens s[bucket] as an exact
    * integer sum — scan-shaped (one explode + one groupBy per doc, the
    * quantized model shipped as a literal array).
    */
  def dsirScore(df: DataFrame, keyCols: Seq[String], textCol: String,
                model: Array[Long]): DataFrame = {
    val dim = model.length
    df.select(col("*"), explode(TextOps.tokens(col(textCol))).as("__tok"))
      .withColumn("__s", element_at(lit(model),
        (TextOps.hash60(col("__tok")) % dim + 1).cast("int")))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__s")).as("dsir_score"), count(lit(1)).as("n_tok"))
  }
}
