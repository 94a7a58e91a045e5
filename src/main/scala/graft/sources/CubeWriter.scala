package graft.sources

import graft.cube.{Cube, GridMapping}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical cube layout: Parquet partitioned by (date(time), spatial block)
  * — the relational analog of the reference's chunked Zarr store
  * (dsio.py:411-533; chunking guidance docs/source/dataaccess.md:129).
  *
  * This is the 100 TB story the cube model promises (Cube.scala): a bbox +
  * time-range query prunes to the handful of (p_date, p_block) partitions
  * that intersect it — the driver lists only those directories, parquet
  * row-group min/max skipping handles the rest. Block ids come from
  * `GridMapping.blockKeyExpr`, so the same arithmetic that plans a pruned
  * scan also wrote the layout.
  */
object CubeWriter {

  /** Write the cube partitioned by (p_date, p_block). Overwrites by default;
    * overwrite mode is forced DYNAMIC per-write (not inherited from the
    * session conf) so it only touches the partitions present in the incoming
    * data — the partition-overwrite upsert primitive. On a session left at
    * Spark's default static mode, an inherited overwrite would silently
    * delete every partition of the cube not covered by the incoming slice.
    */
  def writePartitioned(cube: Cube, path: String, mode: String = "overwrite"): Unit = {
    val gm = cube.gm
    cube.df
      .withColumn("p_date", to_date(cube.time))
      .withColumn("p_block", gm.blockKeyExpr(cube.x, cube.y))
      // cluster rows by their target partition first: one file per
      // (p_date, p_block) instead of one per (partition × task) — the
      // small-files guard that matters far more at 100 TB than here
      .repartition(col("p_date"), col("p_block"))
      .write.partitionBy("p_date", "p_block")
      .option("partitionOverwriteMode", "dynamic")
      .mode(mode).parquet(path)
  }

  /** Block ids intersecting a world bbox (driver-side planning math). */
  def blockIdsForBbox(gm: GridMapping, x1: Double, y1: Double,
                      x2: Double, y2: Double): Seq[Long] =
    gm.ijBboxFromXyBbox(x1, y1, x2, y2).toSeq.flatMap { case (i0, j0, i1, j1) =>
      val nbx = (gm.width + gm.tileWidth - 1) / gm.tileWidth
      for {
        jb <- (j0 / gm.tileHeight) to (j1 / gm.tileHeight)
        ib <- (i0 / gm.tileWidth) to (i1 / gm.tileWidth)
      } yield jb * nbx + ib
    }

  /** Partition-pruned scan: p_date / p_block predicates land in the scan's
    * PartitionFilters (directory pruning); the exact x/y/time predicates
    * run on the surviving partitions only.
    */
  def prunedScan(spark: SparkSession, path: String, gm: GridMapping,
                 bbox: Option[(Double, Double, Double, Double)] = None,
                 dateRange: Option[(String, String)] = None): DataFrame = {
    var df = spark.read.parquet(path)
    bbox.foreach { case (x1, y1, x2, y2) =>
      val ids = blockIdsForBbox(gm, x1, y1, x2, y2)
      df = df.filter(col("p_block").isin(ids: _*))
        .filter(col("x").between(math.min(x1, x2), math.max(x1, x2)) &&
                col("y").between(math.min(y1, y2), math.max(y1, y2)))
    }
    dateRange.foreach { case (d1, d2) =>
      df = df.filter(col("p_date") >= lit(d1).cast("date") &&
                     col("p_date") <= lit(d2).cast("date"))
    }
    df
  }
}
