package graft.operators

import graft.cube.Cube
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance / physical ops (SURVEY §2.13): rechunk, compaction, empty-
  * chunk pruning, attribute updates, schema dump — the Zarr-housekeeping
  * family (chunk.py, unchunk.py, optimize.py, update.py, dump.py)
  * re-expressed as partition housekeeping.
  */
object MaintenanceOps {

  /** rechunk_cube (chunk.py:15-46): co-locate rows by (date, spatial block)
    * so later per-block work (subsampling, kernels, pruned writes) runs
    * without a further shuffle. Returns a cube whose physical partitioning
    * matches the logical tile grid.
    */
  def rechunk(cube: Cube): Cube = {
    val gm = cube.gm
    cube.withDf(_.repartition(
      to_date(cube.time), gm.blockKeyExpr(cube.x, cube.y)))
  }

  /** ANALYZE for cube stores: one distributed pass computing per-chunk
    * value statistics (count/NaN-count/min/max/sum/sum-of-squares per
    * variable) into a `_graft_stats.json` sidecar the DSv2 scan engine
    * consumes for value-predicate chunk pruning, zone-map top-n, and
    * zero-IO aggregate partials — the zone maps parquet gets for free,
    * paid once to accelerate every later query (Spark's ANALYZE TABLE,
    * for cubes). Returns the sidecar path; `outDir` redirects it off
    * read-only stores (readers then need `option("statsDir", outDir)`). */
  def analyzeStore(spark: SparkSession, groupDir: String,
                   outDir: Option[String] = None): String =
    graft.sources.zarr.ChunkStats.analyze(spark, groupDir, outDir)

  /** optimize_dataset / unchunk (optimize.py:15-79): compact a written cube
    * directory to exactly `numFiles` files (small-file cleanup). Uses
    * `repartition` rather than `coalesce`: the one-off round-robin shuffle
    * guarantees the target file count and even file sizes regardless of how
    * the scan combined the small input files into splits.
    */
  def optimize(spark: SparkSession, path: String, numFiles: Int): Unit = {
    val df = spark.read.parquet(path)
    val tmp = s"$path.__optimizing"
    df.repartition(numFiles).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** get_empty_dataset_chunks + prune (chunk.py:49-99, cli/prune.py): drop
    * rows of spatial blocks in which EVERY value of `varName` is NaN; kept
    * blocks keep their NaN cells, exactly like chunk-level pruning.
    */
  def pruneEmptyBlocks(cube: Cube, varName: String): Cube = {
    val gm = cube.gm
    val key = gm.blockKeyExpr(cube.x, cube.y).as("__block")
    val withKey = cube.df.withColumn("__block", key)
    val alive = withKey.groupBy("__block")
      .agg(sum(when(!isnan(col(varName).cast("double")), 1).otherwise(0)).as("__n"))
      .filter(col("__n") > 0).select("__block")
    cube.copy(df = withKey
      .join(broadcast(alive), Seq("__block"), "left_semi")
      .drop("__block"))
  }

  /** update_dataset_attrs (update.py): attach/refresh column metadata. */
  def updateVarAttrs(df: DataFrame, varName: String,
                     attrs: Map[String, String]): DataFrame = {
    val mb = new org.apache.spark.sql.types.MetadataBuilder()
    attrs.foreach { case (k, v) => mb.putString(k, v) }
    df.withColumn(varName, col(varName).as(varName, mb.build()))
  }

  /** find_ancillary_var_names (reference ancvar.py:16-75): CF ancillary-
    * variable discovery for one variable over the frame's column metadata
    * (where [[updateVarAttrs]] puts CF attrs). Three passes, first match
    * wins, mirroring the reference: (1) the variable's own
    * `ancillary_variables` attr; (2) other variables whose `standard_name`
    * is "<var standard_name> <modifier>" (CF 1.7 Appendix C); (3) the
    * xcube `<var>_std` / `<var>_count` uncertainty prefixes. Returns
    * modifier → variable names ("" = unmodified). Pure schema metadata —
    * no data is touched.
    */
  def findAncillaryVarNames(df: DataFrame, varName: String)
      : Map[String, Set[String]] = {
    val fields = df.schema.fields.map(f => f.name -> f).toMap
    def attr(name: String, key: String): Option[String] =
      fields.get(name).flatMap { f =>
        if (f.metadata.contains(key)) Some(f.metadata.getString(key)) else None
      }
    if (!fields.contains(varName)) return Map.empty
    def modifierOf(anc: String): Option[String] =
      attr(anc, "standard_name").flatMap { s =>
        val parts = s.split(" ")
        if (parts.length == 2 && attr(varName, "standard_name").contains(parts(0)))
          Some(parts(1))
        else None
      }
    val declared = attr(varName, "ancillary_variables").toSeq
      .flatMap(_.split(" ")).filter(fields.contains)
      .map(n => modifierOf(n).getOrElse("") -> n)
    if (declared.nonEmpty)
      return declared.groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).toSet }
    val byStdName =
      if (attr(varName, "standard_name").isEmpty) Nil
      else df.columns.filter(_ != varName).toSeq
        .flatMap(n => modifierOf(n).map(_ -> n))
    if (byStdName.nonEmpty)
      return byStdName.groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).toSet }
    Seq("std" -> "standard_error", "count" -> "number_of_observations")
      .collect { case (suffix, m) if fields.contains(s"${varName}_$suffix") =>
        m -> Set(s"${varName}_$suffix")
      }.toMap
  }

  /** update_dataset_attrs spatial/temporal CF attrs (update.py:268):
    * recompute the cube-level geospatial/temporal coverage attributes from
    * the data in one aggregation pass.
    */
  def computeCubeAttrs(cube: Cube): Map[String, String] = {
    val row = cube.df.agg(
      min(cube.x), max(cube.x), min(cube.y), max(cube.y),
      min(cube.time), max(cube.time)).head()
    Map(
      "geospatial_lon_min" -> row.get(0).toString,
      "geospatial_lon_max" -> row.get(1).toString,
      "geospatial_lat_min" -> row.get(2).toString,
      "geospatial_lat_max" -> row.get(3).toString,
      "time_coverage_start" -> row.getTimestamp(4).toInstant.toString,
      "time_coverage_end" -> row.getTimestamp(5).toInstant.toString,
      "geospatial_lon_resolution" -> cube.gm.xRes.toString,
      "geospatial_lat_resolution" -> cube.gm.yRes.toString)
  }

  /** Cell-level diff of two dataset versions sharing a dimension grid —
    * the operational "what changed between yesterday's cube and today's"
    * tool (beyond the reference, which only appends/replaces). One
    * full-outer join on the dimension key; each cell is classified
    * added / removed / changed / same. Scale: the join shuffles on the
    * dimension key both sides — the minimal exchange for a keyed diff —
    * and nothing is collected.
    */
  def diffDatasets(a: DataFrame, b: DataFrame, dims: Seq[String],
                   valueCol: String): DataFrame = {
    require(dims.nonEmpty, "no dimension columns")
    // explicit presence markers: row existence must not be inferred from
    // value-nullness, or a legitimately NULL measurement present in both
    // versions would read as added/removed
    val left = a.select((dims.map(col) :+ col(valueCol).as("__va")) :+
      lit(true).as("__pa"): _*)
    val right = b.select((dims.map(col) :+ col(valueCol).as("__vb")) :+
      lit(true).as("__pb"): _*)
    left.join(right, dims, "full_outer")
      .withColumn("status",
        when(col("__pa").isNull, lit("added"))
          .when(col("__pb").isNull, lit("removed"))
          .when(col("__va") <=> col("__vb"), lit("same"))
          .otherwise(lit("changed")))
      .withColumnRenamed("__va", "value_before")
      .withColumnRenamed("__vb", "value_after")
      .drop("__pa", "__pb")
  }

  /** dump_dataset (dump.py:66): human-readable cube summary. */
  def dump(cube: Cube): String = {
    val gm = cube.gm
    val sb = new StringBuilder
    sb.append(s"cube ${gm.width}x${gm.height} @ (${gm.xMin},${gm.yMin}) ")
    sb.append(s"res (${gm.xRes},${gm.yRes}) crs ${gm.crs}\n")
    sb.append(s"dims: ${cube.timeCol}, ${cube.yCol}, ${cube.xCol}\n")
    sb.append(s"vars: ${cube.varNames.mkString(", ")}\n")
    sb.append(cube.df.schema.treeString)
    sb.toString
  }
}
