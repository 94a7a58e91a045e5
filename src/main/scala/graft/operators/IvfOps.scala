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
    import org.apache.spark.sql.expressions.Window
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = index.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("__cell", "__centroid")
    val q = queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("__qe"))
    // 4-row centroid table → the broadcast nested-loop expansion is
    // queries × nCells, bounded and tiny per query
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__csim", EmbeddingOps.cosine(col("__qe"), col("__centroid")))
      .withColumn("__crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__csim").desc, col("__cell").asc)))
      .filter(col("__crank") <= nProbe)
      .select(col("query_id"), col("__qe"), col("__cell"))
    // no broadcast hint on the probe table: it is queries × nProbe rows of
    // full embeddings — unbounded in the batch size. AQE broadcasts when
    // the runtime size actually fits (same policy as jaccardOnCandidates).
    val cands = index.assigned.join(probes, Seq("__cell"))
      .withColumn("cos_sim",
        round(EmbeddingOps.cosine(col("__qe"), col(embCol)), 6))
    cands
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col(idCol).asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col(idCol), col("cos_sim"))
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
