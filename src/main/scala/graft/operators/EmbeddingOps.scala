package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, mirroring how a 100 TB pipeline actually runs ANN:
  *  - `knnBruteForce`: exact cosine top-k of a SMALL query set against the
  *    corpus. The query side is broadcast; the corpus is scanned once with a
  *    codegen'd `aggregate`/`zip_with` dot product and reduced per query via
  *    a per-partition top-k window. Correctness baseline.
  *  - `signBuckets` + `annBucketed`: LSH-style bucketing by the sign pattern
  *    of fixed coordinate-group sums (deterministic hyperplanes). Search
  *    touches only the query's bucket — the corpus-side shuffle is one
  *    groupBy on the bucket key. Scale path.
  *
  * All arithmetic is done in double after casting, element order fixed, so
  * an SQL oracle reproduces results exactly.
  */
object EmbeddingOps {

  /** Ensure enough partitions for CPU-heavy per-row work: a coarse input
    * (one parquet file = one split; one row group = one usable task)
    * serializes the interpreted higher-order-function arithmetic onto a
    * single core. No-op when the input is already parallel enough — the
    * normal case on a real cluster, where this must NOT add a shuffle.
    * The explicit count opts the exchange out of AQE's byte-based
    * coalescing (small bytes ≠ small CPU).
    */
  def parallelized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val want = spark.sparkContext.defaultParallelism
    // estimate scan parallelism WITHOUT df.rdd: converting to an RDD under
    // AQE can eagerly materialize upstream query stages (side-effect
    // execution) just to read a partition count, and it blocks the driver.
    // Spark BINS small files into shared scan partitions (each file padded
    // by openCostInBytes, packed up to maxPartitionBytes), so #files alone
    // OVERSTATES parallelism — mirror the packing formula instead.
    // Non-file-backed plans (0 input files: local relations, views) are
    // left untouched; local test relations already parallelize to
    // defaultParallelism.
    val files = df.inputFiles.length
    if (files == 0) return df
    val conf = spark.sessionState.conf
    val maxPart = math.max(1L, conf.filesMaxPartitionBytes)
    val openCost = conf.filesOpenCostInBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val padded = bytes + BigInt(files) * openCost
    // mirror Spark's own FilePartition sizing: maxSplitBytes = min(
    // maxPartitionBytes, max(openCost, totalBytes / defaultParallelism)) —
    // the bytesPerCore clamp is what makes many-small-file scans parallel,
    // so omitting it would add a repartition shuffle to inputs Spark
    // already splits across the cluster
    val bytesPerCore = (padded / math.max(1, want))
      .min(BigInt(Long.MaxValue)).toLong
    val maxSplit = math.min(maxPart, math.max(openCost, bytesPerCore))
    val splits = ((padded + maxSplit - 1) / math.max(1L, maxSplit))
      .min(BigInt(Int.MaxValue)).toLong
    if (splits >= math.min(want, 8)) df
    else df.repartition(want)
  }

  /** Dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity — backed by the codegen'd [[graft.functions.CosineSim]]
    * Catalyst expression (one fused primitive loop inside WholeStageCodegen);
    * its accumulation order replicates the HOF form `dot/(norm·norm)`
    * bit-for-bit, so oracle results are unchanged.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The interpreted higher-order-function form (kept for reference and
    * cross-checking the native expression).
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance, HOF form: left-to-right accumulation over
    * zipped coordinates — the engine-portable order an SQL oracle can
    * reproduce bit-for-bit (`list_sum(list_transform(...))`).
    */
  def l2Sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.L2Sq(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The interpreted higher-order-function form of [[l2Sq]] (kept for
    * reference and the equality regression test in PipelineOpsSpec).
    */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)

  /** One distributed k-means (Lloyd) step over an embedding corpus.
    *
    * Assignment is SCAN-SHAPED: the k centroids are driver-side literals
    * (the model is k-bounded by definition), each row computes its k
    * rounded distances and picks the argmin via `array_min` over
    * (dist, cid) structs — no shuffle, no join, ties break on the lower
    * centroid id. This is the shape that holds at 100 TB: the only
    * exchange in a full iteration is the update's map-side-combined
    * groupBy below.
    *
    * Returns one row per corpus row: (idCol, embCol, cid, dist).
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, embCol: String,
                   centroids: Seq[(Int, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty, "no centroids")
    val cands = centroids.map { case (cid, c) =>
      struct(round(l2Sq(col(embCol), typedLit(c)), 6).as("dist"),
        lit(cid.toLong).as("cid"))
    }
    parallelized(corpus)
      .withColumn("__best", array_min(array(cands: _*)))
      .select(col(idCol), col(embCol),
        col("__best.cid").as("cid"), col("__best.dist").as("dist"))
  }

  /** The update half of the Lloyd step: per-dimension sums and member
    * counts of every new centroid — ONE map-side-combined aggregation
    * (k·dim result rows; the caller divides sum by n for the mean, or
    * feeds the sums straight into the next iteration's literals).
    */
  def kmeansUpdate(assigned: DataFrame, embCol: String): DataFrame =
    assigned
      .select(col("cid"), posexplode(col(embCol)).as(Seq("pos", "__x")))
      .groupBy(col("cid"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__x").cast("double").cast("decimal(28,10)")), 6)
          .cast("double").as("sum_x"))

  /** Full Lloyd iterations: assign → update → divide, repeated `iters`
    * times. The model (k·dim doubles) lives on the driver between
    * iterations — the legitimate driver-sized state, exactly like
    * spark.ml's KMeans — while all data passes stay the scan + one-agg
    * shape of [[kmeansAssign]]/[[kmeansUpdate]]. A centroid that loses
    * all members keeps its previous position (the standard empty-cluster
    * rule). Returns the final centroids.
    */
  def kmeansIterate(corpus: DataFrame, idCol: String, embCol: String,
                    seeds: Seq[(Int, Array[Double])],
                    iters: Int): Seq[(Int, Array[Double])] = {
    require(iters >= 0, s"iters $iters")
    var centroids = seeds
    var it = 0
    while (it < iters) {
      val stats = kmeansUpdate(
          kmeansAssign(corpus, idCol, embCol, centroids), embCol)
        .collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) ->
          (r.getLong(2), r.getDouble(3)))
        .toMap
      centroids = centroids.map { case (cid, prev) =>
        val dims = prev.indices.map(p => stats.get((cid, p)))
        if (dims.exists(_.isEmpty)) (cid, prev) // lost every member
        else (cid, dims.map { case Some((n, sum)) => sum / n }.toArray)
      }
      it += 1
    }
    centroids
  }

  /** Sign-pattern LSH bucket: the embedding is cut into `nGroups` contiguous
    * coordinate groups; bit g = sign of the group sum. Fixed, deterministic
    * "hyperplanes" — the same bucket function is computable in any engine.
    */
  def signBucket(emb: Column, dim: Int, nGroups: Int): Column = {
    val groupSize = dim / nGroups
    val bits = (0 until nGroups).map { g =>
      val s = aggregate(slice(emb, g * groupSize + 1, groupSize),
        lit(0.0), (acc, x) => acc + x.cast("double"))
      when(s >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Exact cosine top-k neighbors for each query row. `queries` must be
    * small (it is broadcast). Ranks are deterministic: similarity is rounded
    * before ranking and ties break on neighbor id ascending.
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, idCol: String,
                    embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("__qe"))
    val joined = parallelized(corpus).join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("__qe"), col(embCol)), 6))
    // bounded-heap top-k per query, NOT a row_number window: each query's
    // candidate list is the whole corpus, and a window would sort it all
    // inside one partition; the aggregate keeps k rows per map task
    joined.groupBy("query_id")
      .agg(graft.functions.TopK.bottomK(
        struct(negate(col("cos_sim")).as("__o"), col(idCol), col("cos_sim")),
        k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__r")))
      .select(col("query_id"), (col("__p") + 1).as("rank"),
        col(s"__r.$idCol").as(idCol), col("__r.cos_sim").as("cos_sim"))
  }

  /** Default sign-bucket size cap for [[nearDupPairs]] — the same
    * discipline as `TextOps.DefaultMaxBucket`: a bucket of n members emits
    * n·(n−1)/2 pairs, so one hot bucket (near-zero embeddings, a
    * template-heavy corpus where one vector repeats) makes the self-join
    * quadratic. Dropping buckets above the cap is an exact no-op below it,
    * and a dropped bucket is, for dedup purposes, one duplicate cluster —
    * callers read [[oversizedSignBuckets]] instead of enumerating its pairs.
    */
  val DefaultMaxBucket: Int = 10000

  /** Corpus rows tagged with their sign bucket — the shared projection of
    * [[nearDupPairs]] and [[oversizedSignBuckets]].
    */
  def signBucketed(corpus: DataFrame, embCol: String,
                   dim: Int, nGroups: Int): DataFrame =
    parallelized(corpus)
      .withColumn("bucket", signBucket(col(embCol), dim, nGroups))

  /** (bucket, bucket_n) of sign buckets the cap in [[nearDupPairs]] drops —
    * one map-side-combined count; part of the result, never a silent skip.
    */
  def oversizedSignBuckets(bucketed: DataFrame, maxBucket: Int): DataFrame =
    bucketed.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > maxBucket)

  /** Embedding-cosine near-duplicate pairs: all (a, b) with cosine ≥
    * `threshold`, candidates restricted to shared sign-buckets — a bucketed
    * self-join, never an all-pairs comparison. Rounded similarity so an SQL
    * oracle reproduces the threshold decision exactly.
    *
    * Buckets with more than `maxBucket` members are dropped BEFORE the
    * self-join (one count aggregation; filtering one join side suffices for
    * an inner equi-join), and singleton buckets are pruned by the same
    * aggregation — the `TextOps.candidatePairs` cap discipline.
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String,
                   dim: Int, nGroups: Int, threshold: Double,
                   maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bucketed = signBucketed(corpus, embCol, dim, nGroups)
    val ok = bucketed.groupBy("bucket").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") > 1 && col("bucket_n") <= maxBucket)
      .select("bucket")
    val a = bucketed.join(ok, Seq("bucket"))
      .select(col(idCol).as("id_a"), col(embCol).as("__ea"), col("bucket"))
    // prune the b side too: without it every row of an oversized bucket
    // still shuffles into one join-key partition (a skewed straggler even
    // though it matches nothing); the ok set is one row per surviving
    // bucket and the b-ok join output is already hash-partitioned on
    // bucket, so the final equi-join reuses that exchange
    val b = bucketed.join(ok, Seq("bucket"))
      .select(col(idCol).as("id_b"), col(embCol).as("__eb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine(col("__ea"), col("__eb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** (cid, cluster_n) of k-means clusters the cap in [[clusterPairs]]
    * drops — the SemDeDup degenerate-cluster report.
    */
  def oversizedClusters(assigned: DataFrame, maxCluster: Int): DataFrame =
    assigned.groupBy("cid").agg(count(lit(1)).as("cluster_n"))
      .filter(col("cluster_n") > maxCluster)

  /** SemDeDup within-cluster near-duplicate pairs over a [[kmeansAssign]]
    * output: (cid, id_a, id_b, sim) for every same-cluster pair with
    * rounded cosine ≥ `threshold`. The self-join is an equi-join on the
    * cluster id — and, like [[nearDupPairs]], it is CAPPED: a degenerate
    * cluster (boilerplate corpora collapse into one) with more than
    * `maxCluster` members is dropped before the join (filtering one side of
    * the inner equi-join suffices) and reported via [[oversizedClusters]];
    * production callers re-cluster such a cluster with a larger k instead
    * of enumerating its quadratic pairs.
    */
  def clusterPairs(assigned: DataFrame, idCol: String, embCol: String,
                   threshold: Double,
                   maxCluster: Int = DefaultMaxBucket): DataFrame = {
    val ok = assigned.groupBy("cid").agg(count(lit(1)).as("cluster_n"))
      .filter(col("cluster_n") > 1 && col("cluster_n") <= maxCluster)
      .select("cid")
    val a = assigned.join(ok, Seq("cid"))
      .select(col("cid"), col(idCol).as("id_a"), col(embCol).as("__ea"))
    // b side pruned too — see nearDupPairs: keeps an oversized cluster's
    // rows out of the final join's shuffle entirely
    val b = assigned.join(ok, Seq("cid"))
      .select(col("cid"), col(idCol).as("id_b"), col(embCol).as("__eb"))
    a.join(b, Seq("cid")).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("__ea"), col("__eb")), 6))
      .filter(col("sim") >= threshold)
      .select("cid", "id_a", "id_b", "sim")
  }

  /** Bucketed ANN: best neighbor per query WITHIN the query's sign bucket.
    * The corpus never cross-joins — candidates come from the bucket
    * equi-join.
    */
  def annBucketed(queries: DataFrame, corpus: DataFrame, idCol: String,
                  embCol: String, dim: Int, nGroups: Int): DataFrame = {
    val bucketed = parallelized(corpus)
      .withColumn("bucket", signBucket(col(embCol), dim, nGroups))
    val q = bucketed.join(broadcast(queries.select(col(idCol))), Seq(idCol))
      .select(col(idCol).as("query_id"), col(embCol).as("__qe"), col("bucket"))
    val cands = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("__qe"), col(embCol)), 6))
    cands.groupBy("query_id", "bucket")
      .agg(count(lit(1)).as("n_candidates"),
        max_by(col(idCol), struct(col("cos_sim"), -col(idCol))).as("best_id"),
        max(col("cos_sim")).as("best_sim"))
  }

  // ------------------------------------------- product quantization (ADC)

  /** PQ codebooks: `m` subspaces × k centroids, each of length dim/m —
    * `codebooks(s)` is the centroid list of subspace `s`. Trained with the
    * SAME Lloyd machinery as [[kmeansIterate]], one driver-loop pass per
    * subspace over sliced subvectors (m is small and fixed; every data
    * pass stays the scan + one-agg Lloyd shape). `iters = 0` returns the
    * seeds — the deterministic form the SQL oracle uses.
    */
  def pqTrain(corpus: DataFrame, idCol: String, embCol: String,
              seeds: Seq[(Int, Array[Double])], m: Int,
              iters: Int): Seq[Seq[(Int, Array[Double])]] = {
    require(seeds.nonEmpty && seeds.head._2.length % m == 0,
      s"dim ${seeds.headOption.map(_._2.length)} not divisible into $m subspaces")
    val subDim = seeds.head._2.length / m
    (0 until m).map { s =>
      val subSeeds = seeds.map { case (cid, c) =>
        (cid, c.slice(s * subDim, (s + 1) * subDim))
      }
      val sub = corpus.select(col(idCol),
        slice(col(embCol), s * subDim + 1, subDim).as("__sub"))
      kmeansIterate(sub, idCol, "__sub", subSeeds, iters)
    }
  }

  /** PQ encode: each row's m-part code — per subspace, the argmin centroid
    * (rounded-6 L2, ties to the lower code, the [[kmeansAssign]] rule).
    * ONE scan, no shuffle; output is the relational code form
    * (idCol, sub, code) that ADC search equi-joins.
    */
  def pqEncode(corpus: DataFrame, idCol: String, embCol: String,
               codebooks: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val subDim = codebooks.head.head._2.length
    // one compact native loop per subspace (PqArgminCode — bit-exact twin
    // of array_min over (round(l2_sq(slice, lit), 6), code) structs): the
    // inlined m·k l2_sq form generated past the JVM's 64 KB method limit
    // at m=8, k=16 inside a scan-fused stage, whose local-variable inputs
    // defeat expression splitting — the whole stage silently fell back to
    // interpreted eval (r20 plan dump: 2 CodeGenerator compile failures
    // per q_pq_adc/q_ann_rerank run; none with the native loop).
    val bests = codebooks.zipWithIndex.map { case (cents, s) =>
      ColumnBridge.column(graft.functions.PqArgminCode(
        ColumnBridge.expression(col(embCol)),
        cents.map { case (code, c) => (code.toLong, c) },
        s * subDim, subDim))
    }
    // two-step on purpose: the argmin array lands in a PROJECT and the
    // generate consumes a plain attribute (an inlined generator argument
    // sits in generate_doConsume, which codegen cannot split).
    // posexplode_OUTER: the plain generator gets an optimizer-inferred
    // size(..) > 0 filter that re-evaluates the WHOLE m-code array per row
    // a second time (InferFiltersFromGenerate — the documented spanGrams
    // pathology); the array is always exactly m non-null elements, so the
    // outer form is identical
    parallelized(corpus)
      .select(col(idCol), array(bests: _*).as("__codes"))
      .select(col(idCol),
        posexplode_outer(col("__codes")).as(Seq("sub", "code")))
      .select(col(idCol), col("sub").cast("long").as("sub"), col("code"))
  }

  /** Per-query ADC lookup table: the rounded-6 L2 distance from every
    * query subvector to every (sub, code) centroid — q·m·k rows, tiny by
    * construction (the broadcast side of the search).
    */
  def pqLut(queries: DataFrame, idCol: String, embCol: String,
            codebooks: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    val subDim = codebooks.head.head._2.length
    val entries = for {
      (cents, s) <- codebooks.zipWithIndex
      (code, c) <- cents
    } yield (s, code, c.toSeq)
    queries
      .select(col(idCol).as("query_id"), col(embCol).as("__qe"))
      .withColumn("__cb", explode(typedLit(entries)))
      .select(col("query_id"), col("__cb._1").cast("long").as("sub"),
        col("__cb._2").cast("long").as("code"),
        round(l2Sq(slice(col("__qe"), col("__cb._1") * subDim + 1, lit(subDim)),
          col("__cb._3")), 6).as("d"))
  }

  // ------------------------------------------------------------- SQ8

  /** Scalar-quantization training (the FAISS SQ8 shape): per-dimension
    * [min, max] over the corpus — ONE map-side-combined aggregation, 2·dim
    * doubles to the driver (bounded, like the k-means seed sets). Returns
    * (mins, spans).
    */
  def sqTrain(corpus: DataFrame, embCol: String,
              dim: Int): (Array[Double], Array[Double]) = {
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col(embCol), i + 1).cast("double")),
      max(element_at(col(embCol), i + 1).cast("double"))))
    val r = corpus.agg(aggs.head, aggs.tail: _*).collect()(0)
    val mins = Array.tabulate(dim)(i => r.getDouble(2 * i))
    val spans = Array.tabulate(dim)(i => r.getDouble(2 * i + 1) - mins(i))
    (mins, spans)
  }

  /** SQ8 encode: each coordinate quantizes to one of 256 uniform bins over
    * its dimension's [min, max] — the corpus stores integer codes only
    * (4 bytes/dim here vs 32 raw; a production byte column is a cast).
    * PURE floor arithmetic: no round(), so no half-way ties — every step
    * (−, /, ×, floor, least) is IEEE-exact and engine-portable.
    */
  def sqEncode(corpus: DataFrame, idCol: String, embCol: String,
               mins: Array[Double], spans: Array[Double]): DataFrame =
    corpus.select(col(idCol), array(mins.indices.map { i =>
      val x = element_at(col(embCol), i + 1).cast("double")
      val v = when(lit(spans(i)) === 0.0, lit(0.0))
        .otherwise(floor(((x - lit(mins(i))) / lit(spans(i))) * 256.0))
      least(v, lit(255.0)).cast("long")
    }: _*).as("codes"))

  /** Decoded bin centers of a `codes` column. */
  def sqDecoded(mins: Array[Double], spans: Array[Double]): Column =
    array(mins.indices.map { i =>
      lit(mins(i)) +
        ((element_at(col("codes"), i + 1).cast("double") + 0.5) * lit(spans(i))) /
          256.0
    }: _*)

  /** Asymmetric SQ8 search: float queries against the decoded corpus
    * codes — scan-shaped (queries broadcast, decode inline per row), with
    * the per-query top-k through the bounded-heap aggregate.
    */
  def sqSearch(queries: DataFrame, encoded: DataFrame, idCol: String,
               embCol: String, mins: Array[Double], spans: Array[Double],
               k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).cast("array<double>").as("__qe"))
    parallelized(encoded).join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("cos_sim", round(cosine(col("__qe"), sqDecoded(mins, spans)), 6))
      .groupBy("query_id")
      .agg(graft.functions.TopK.bottomK(
        struct(negate(col("cos_sim")).as("__o"), col(idCol), col("cos_sim")),
        k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__r")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col(s"__r.$idCol").as(idCol), col("__r.cos_sim").as("cos_sim"))
  }

  /** Asymmetric-distance PQ search (the IVF-PQ / FAISS scale design): the
    * corpus is touched ONLY through its integer codes — the per-query
    * distance table broadcasts, codes equi-join it on (sub, code), and one
    * map-side-combined groupBy sums the m DECIMAL table entries per
    * (query, vector). Approximate distances, exact arithmetic: the sums
    * are order-independent, so ranks are deterministic (ties on vec_id).
    */
  def pqSearch(queries: DataFrame, corpus: DataFrame, idCol: String,
               embCol: String, codebooks: Seq[Seq[(Int, Array[Double])]],
               k: Int): DataFrame = {
    val m = codebooks.length
    val enc = pqEncode(corpus, idCol, embCol, codebooks)
    val lut = pqLut(queries, idCol, embCol, codebooks)
    val adc = enc.join(broadcast(lut), Seq("sub", "code"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("d").cast("decimal(18,6)")).as("__ad"),
        count(lit(1)).as("__m"))
    // bounded-heap top-k per query (DECIMAL distance ascending, id
    // tiebreak) — the candidate set is corpus-sized per query, so a
    // row_number window would sort it all in one partition
    adc.filter(col("__m") === m) // every subspace contributed exactly once
      .groupBy("query_id")
      .agg(graft.functions.TopK.bottomK(
        struct(col("__ad"), col(idCol)), k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__r")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col(s"__r.$idCol").as(idCol),
        col("__r.__ad").cast("double").as("adist"))
  }
}
