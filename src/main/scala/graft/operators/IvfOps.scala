package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor index — the coarse-
  * quantizer scale path alongside the sign-bucket LSH in `EmbeddingOps`:
  * a k-means codebook partitions the corpus into cells; a query scans only
  * its `nProbe` nearest cells instead of the whole corpus.
  *
  * Training samples the corpus once (spark.ml KMeans, fixed seed);
  * assignment is one pass; search cost is corpus/cells × nProbe. The
  * centroid table is tiny and lives on the driver.
  */
object IvfOps {

  final case class IvfIndex(assigned: DataFrame, centroids: Array[Array[Double]])

  /** Build the index: cluster embeddings into `nCells` cells and tag every
    * row with its cell id.
    */
  def build(corpus: DataFrame, idCol: String, embCol: String,
            nCells: Int, seed: Long = 42L, maxIter: Int = 5): IvfIndex = {
    val withVec = corpus.withColumn("__vec",
      array_to_vector(col(embCol).cast("array<double>")))
    // few iterations suffice: the coarse quantizer only needs a reasonable
    // partition of the corpus — recall comes from nProbe, not from a
    // converged codebook (the standard IVF trade-off)
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("__vec").setPredictionCol("__cell")
      .fit(withVec)
    val assigned = model.transform(withVec).drop("__vec")
    IvfIndex(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Persist an index: the assigned corpus as parquet plus the (tiny)
    * centroid table. An IVF index is built once and served many times —
    * persistence is part of the operator's contract, not an optimization.
    */
  def save(index: IvfIndex, path: String): Unit = {
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    IvfIndex(spark.read.parquet(s"$path/assigned"), cents)
  }

  /** Append new vectors to an existing index WITHOUT retraining — the
    * FAISS `add()` contract: the coarse codebook is fixed at build time
    * and maintenance only assigns. Assignment reuses the scan-shaped
    * [[EmbeddingOps.kmeansAssign]] argmin (the centroids are k driver-side
    * literals, so the delta pass is a zero-shuffle projection; ties break
    * to the lower cell id), which makes maintenance deterministic: the
    * incrementally maintained list table is EXACTLY the table produced by
    * `kmeansAssign`ing the whole corpus against the same saved codebook —
    * nothing drifts with append order. Note the determinism contract is
    * stated against `kmeansAssign` (rounded-6 distances, ties to the
    * lower cell), NOT against spark.ml `KMeans.transform` (unrounded):
    * a near-tie vector can land in a different cell than a full
    * `build()` re-run would place it, which only shifts which probe list
    * holds it — recall under `nProbe < nCells` may differ by that row.
    * Returns the maintained index lazily (the union plan); use
    * [[appendAndStore]] when serving from storage so repeated appends
    * cannot stack N union plans.
    */
  def append(index: IvfIndex, newRows: DataFrame, idCol: String,
             embCol: String): IvfIndex = {
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c) }
    val delta = EmbeddingOps.kmeansAssign(newRows, idCol, embCol, cents)
      .select(col(idCol), col(embCol), col("cid").cast("int").as("__cell"))
    IvfIndex(
      index.assigned.select(idCol, embCol, "__cell").unionByName(delta),
      index.centroids)
  }

  /** Maintenance append for a SAVED index: assign the delta against the
    * stored codebook (the [[append]] path), `mode("append")` the assigned
    * rows into `path/assigned`, and return the index re-opened from
    * storage. N successive appends therefore serve from ONE parquet scan —
    * plan depth stays constant instead of growing a union per append,
    * which is what a long-lived serving index needs (a 1000-append day
    * must not produce a 1000-way union plan).
    */
  def appendAndStore(spark: org.apache.spark.sql.SparkSession, path: String,
                     newRows: DataFrame, idCol: String,
                     embCol: String): IvfIndex = {
    val index = load(spark, path)
    val stored = index.assigned.schema.fieldNames.toSeq
    require(stored.toSet == Set(idCol, embCol, "__cell"),
      s"$path/assigned holds columns ${stored.mkString(",")} — appendAndStore " +
        s"maintains ($idCol, $embCol, __cell) tables; re-save the index " +
        "with exactly those columns to serve it incrementally")
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c) }
    val delta = EmbeddingOps.kmeansAssign(newRows, idCol, embCol, cents)
      .select(col(idCol), col(embCol), col("cid").cast("int").as("__cell"))
    delta.select(stored.map(col): _*)
      .write.mode("append").parquet(s"$path/assigned")
    load(spark, path)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** Batch top-k cosine search: every query row probes its `nProbe`
    * nearest cells in ONE plan — no per-query driver loop (that shape is
    * for single-query serving; a 10k-query batch must be one job).
    *
    * Stage 1 ranks cells per query against the (tiny, broadcast) centroid
    * table; stage 2 equi-joins the corpus on the cell id against the
    * (queries × nProbe)-row probe table, so each corpus row is compared
    * only with the queries probing its cell; stage 3 is a per-query top-k
    * window. The corpus is scanned once and never repartitioned by query.
    */
  def searchBatch(index: IvfIndex, queries: DataFrame, qIdCol: String,
                  qEmbCol: String, idCol: String, embCol: String,
                  k: Int, nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("__cell", "__centroid")
    val q = queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("__qe"))
    // 4-row centroid table → the broadcast nested-loop expansion is
    // queries × nCells, bounded and tiny per query; nProbe nearest cells
    // via the bounded-heap aggregate (no window sort), __qe rides along
    // as first() since it is constant per query
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__csim", EmbeddingOps.cosine(col("__qe"), col("__centroid")))
      .groupBy("query_id")
      .agg(first(col("__qe")).as("__qe"),
        graft.functions.TopK.bottomK(
          struct(negate(col("__csim")).as("__o"), col("__cell")),
          nProbe).as("__tk"))
      .select(col("query_id"), col("__qe"),
        explode(col("__tk.__cell")).as("__cell"))
    // no broadcast hint on the probe table: it is queries × nProbe rows of
    // full embeddings — unbounded in the batch size. AQE broadcasts when
    // the runtime size actually fits (same policy as jaccardOnCandidates).
    val cands = index.assigned.join(probes, Seq("__cell"))
      .withColumn("cos_sim",
        round(EmbeddingOps.cosine(col("__qe"), col(embCol)), 6))
    // final per-query top-k: candidates are (corpus/nCells)·nProbe rows
    // per query — corpus-scaling, so again a heap aggregate, not a window
    cands.groupBy("query_id")
      .agg(graft.functions.TopK.bottomK(
        struct(negate(col("cos_sim")).as("__o"), col(idCol), col("cos_sim")),
        k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__r")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col(s"__r.$idCol").as(idCol), col("__r.cos_sim").as("cos_sim"))
  }

  // ------------------------------------------------------------- IVF-PQ

  /** IVF-PQ index (the FAISS IVFPQ layout): the corpus is stored as
    * nothing but a cell id plus m integer PQ codes per vector — codes
    * quantize the RESIDUAL x − centroid(cell), which is what makes PQ
    * accurate inside a cell (residuals are centered, so the sub-codebooks
    * spend their 2^bits on local structure, not on the global spread).
    */
  final case class IvfPqIndex(codes: DataFrame, // (idCol, __cell, sub, code)
                              centroids: Array[Array[Double]],
                              codebooks: Seq[Seq[(Int, Array[Double])]])

  /** Attach the per-row residual against the row's cell centroid. */
  private def withResidual(assigned: DataFrame, embCol: String,
                           centroids: Array[Array[Double]]): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("__cell", "__centroid")
    assigned.join(broadcast(cents), Seq("__cell"))
      .withColumn("__resid",
        zip_with(col(embCol).cast("array<double>"), col("__centroid"),
          (x, c) => x - c))
  }

  /** Train PQ codebooks on the residuals and encode the whole corpus —
    * one residual pass for seeds (k collected rows), m·iters Lloyd passes,
    * one encode scan. `nCodes` centroids per subspace.
    */
  def buildPq(index: IvfIndex, idCol: String, embCol: String, m: Int,
              nCodes: Int, iters: Int): IvfPqIndex = {
    val resid = withResidual(index.assigned, embCol, index.centroids)
    val seeds = resid.select(col(idCol), col("__resid"))
      .orderBy(col(idCol)).limit(nCodes).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }.toSeq
    val cbs = EmbeddingOps.pqTrain(resid, idCol, "__resid", seeds, m, iters)
    val codes = EmbeddingOps.pqEncode(resid, idCol, "__resid", cbs)
      .join(index.assigned.select(col(idCol), col("__cell")), Seq(idCol))
    IvfPqIndex(codes, index.centroids, cbs)
  }

  /** IVF-PQ batch search: probe the `nProbe` nearest cells per query, then
    * rank candidates by asymmetric distance over the PQ codes — per
    * (query, probed cell) the residual lookup table is q·nProbe·m·k rows
    * (broadcast); candidate cost is an equi-join on (cell, sub, code) plus
    * one map-side-combined DECIMAL sum. The raw corpus vectors are never
    * touched at search time.
    */
  def searchPq(index: IvfPqIndex, queries: DataFrame, qIdCol: String,
               qEmbCol: String, idCol: String, k: Int,
               nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = index.codebooks.length
    val subDim = index.codebooks.head.head._2.length
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("__cell", "__centroid")
    val q = queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("__qe"))
    // nProbe nearest cells per query through the bounded-heap aggregate
    // (see searchBatch); the residual needs the probed cell's centroid, so
    // it rides in the struct payload behind the ordering fields
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__csim", EmbeddingOps.cosine(col("__qe"), col("__centroid")))
      .groupBy("query_id")
      .agg(first(col("__qe")).as("__qe"),
        graft.functions.TopK.bottomK(
          struct(negate(col("__csim")).as("__o"), col("__cell"),
            col("__centroid")), nProbe).as("__tk"))
      .select(col("query_id"), col("__qe"),
        explode(col("__tk")).as("__r"))
      .withColumn("__qr",
        zip_with(col("__qe").cast("array<double>"), col("__r.__centroid"),
          (x, c) => x - c))
      .select(col("query_id"), col("__r.__cell").as("__cell"), col("__qr"))
    // per-(query, cell) residual LUT against every (sub, code) centroid
    val entries = for {
      (cbs, s) <- index.codebooks.zipWithIndex
      (code, c) <- cbs
    } yield (s, code, c.toSeq)
    val lut = probes
      .withColumn("__cb", explode(typedLit(entries)))
      .select(col("query_id"), col("__cell"),
        col("__cb._1").cast("long").as("sub"),
        col("__cb._2").cast("long").as("code"),
        round(EmbeddingOps.l2Sq(
          slice(col("__qr"), col("__cb._1") * subDim + 1, lit(subDim)),
          col("__cb._3")), 6).as("d"))
    val adc = index.codes.join(broadcast(lut), Seq("__cell", "sub", "code"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("d").cast("decimal(18,6)")).as("__ad"),
        count(lit(1)).as("__m"))
    // per-query top-k over corpus-scaling candidates: heap aggregate
    adc.filter(col("__m") === m)
      .groupBy("query_id")
      .agg(graft.functions.TopK.bottomK(
        struct(col("__ad"), col(idCol)), k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")).as(Seq("__p", "__r")))
      .select(col("query_id"), (col("__p") + 1).cast("long").as("rank"),
        col(s"__r.$idCol").as(idCol),
        col("__r.__ad").cast("double").as("adist"))
  }

  /** Top-k cosine neighbors of `query`, probing only the `nProbe` cells
    * whose centroids are nearest the query.
    */
  def search(index: IvfIndex, idCol: String, embCol: String,
             query: Array[Double], k: Int, nProbe: Int): DataFrame = {
    val cells = index.centroids.zipWithIndex
      .sortBy { case (c, _) => -cosine(c, query) }
      .take(nProbe).map(_._2)
    val candidates = index.assigned.filter(col("__cell").isin(cells.toIndexedSeq.map(Integer.valueOf): _*))
    candidates
      .withColumn("cos_sim",
        round(EmbeddingOps.cosine(
          array(query.toIndexedSeq.map(lit): _*), col(embCol)), 6))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("cos_sim"))
  }
}
