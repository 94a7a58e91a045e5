package graft.sources

import graft.cube.{Cube, GridMapping}
import graft.operators.SubsampleOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `.levels`-style multi-resolution pyramid store (reference
  * mldataset/fs.py, level.py:139-258): one Parquet table per level,
  * `L0..Ln`, each level a 2×2 mean aggregation of the previous — the
  * materialized-aggregate form of MultiLevelDataset.
  *
  * Levels are built progressively (L2 from L1, not from L0) so each build
  * step shuffles only the previous level's already-reduced cell count; the
  * whole pyramid costs ~4/3 of one pass over L0.
  */
object LevelStore {

  private def levelPath(root: String, level: Int) = s"$root/L$level"

  /** Sidecar name of the per-pyramid grid metadata (the relational analog
    * of the reference's `.levels` metadata): column bindings + per-level
    * grid mapping, consumed by [[graft.plans.PyramidRewrite]] to retarget
    * block-aggregation scans to the matching coarser level.
    */
  val MetaFileName = "_levels.json"

  final case class LevelMeta(level: Int, xMin: Double, yMin: Double,
                             yMax: Double, xRes: Double, yRes: Double,
                             yDown: Boolean)
  /** `agg` records the per-variable level aggregation (mean/min/max/...)
    * so [[graft.plans.PyramidRewrite]] can retarget exactly the matching
    * aggregate and bail on any other; absent entries mean "mean" (the
    * pre-aggregator-aware sidecar format). */
  final case class PyramidMeta(xCol: String, yCol: String, timeCol: String,
                               levels: Seq[LevelMeta],
                               agg: Map[String, String] = Map.empty)

  private def writeMeta(root: String, cube: Cube, gms: Seq[GridMapping],
                        agg: Map[String, String]): Unit = {
    val levels = gms.zipWithIndex.map { case (g, l) =>
      s"""{"level":$l,"xMin":${g.xMin},"yMin":${g.yMin},"yMax":${g.yMax},""" +
        s""""xRes":${g.xRes},"yRes":${g.yRes},"yDown":${g.yDown}}"""
    }
    val aggJson = agg.toSeq.sortBy(_._1)
      .map { case (v, m) => s""""$v":"$m"""" }.mkString(",")
    val json =
      s"""{"xCol":"${cube.xCol}","yCol":"${cube.yCol}","timeCol":"${cube.timeCol}",""" +
        s""""agg":{$aggJson},""" +
        s""""levels":[${levels.mkString(",")}]}"""
    // through ByteStore: local pyramids keep the java.nio path, scheme'd
    // roots (s3g://...) write the sidecar as an object next to the levels
    ByteStore.current.write(s"$root/$MetaFileName", json.getBytes("UTF-8"))
  }

  /** Parse a pyramid's `_levels.json`; None when the sidecar is absent
    * (a plain parquet directory that merely looks like `.../L0`). Reads
    * through the Hadoop filesystem of the root's scheme, so file:/s3a:/
    * hdfs: pyramids all resolve.
    */
  def readMeta(root: String,
               conf: org.apache.hadoop.conf.Configuration =
                 new org.apache.hadoop.conf.Configuration()): Option[PyramidMeta] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$MetaFileName")
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.readTree(bytes)
    val levels = (0 until n.get("levels").size()).map { i =>
      val l = n.get("levels").get(i)
      LevelMeta(l.get("level").asInt, l.get("xMin").asDouble,
        l.get("yMin").asDouble, l.get("yMax").asDouble,
        l.get("xRes").asDouble, l.get("yRes").asDouble,
        l.get("yDown").asBoolean)
    }
    val agg = Option(n.get("agg")).filter(_.isObject).map { a =>
      import scala.jdk.CollectionConverters._
      a.properties.iterator.asScala.map(e => e.getKey -> e.getValue.asText).toMap
    }.getOrElse(Map.empty[String, String])
    Some(PyramidMeta(n.get("xCol").asText, n.get("yCol").asText,
      n.get("timeCol").asText, levels, agg))
  }

  /** Build and write levels 0..maxLevel; returns the per-level grid
    * mappings. `methods` picks the per-variable level aggregation (the
    * subsampling.py AGG_METHODS — must compose progressively, since level
    * k+1 derives from level k: mean/min/max/sum/first qualify, count does
    * not); empty = `mean` for every numeric variable (the float default —
    * subsampling.py auto rule). The chosen aggregators are recorded in
    * the `_levels.json` sidecar so the pyramid-rewrite rule retargets
    * only MATCHING aggregates.
    */
  def writeLevels(cube: Cube, root: String, maxLevel: Int,
                  methods: Seq[(String, String)] = Seq.empty): Seq[GridMapping] = {
    val chosen: Seq[(String, String)] =
      if (methods.nonEmpty) methods
      else cube.varNames.filter(v =>
        cube.df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
        .map(_ -> "mean")
    require(chosen.map(_._1).distinct.length == chosen.length,
      "one aggregation method per variable")
    require(!chosen.exists(_._2 == "count"),
      "count does not compose progressively (level k+1 would count level-k " +
        "cells, not base rows) — record counts as a summed variable instead")
    var cur = cube
    cur.df.write.mode("overwrite").parquet(levelPath(root, 0))
    val gms = Seq.newBuilder[GridMapping]
    gms += cur.gm
    for (_ <- 1 to maxLevel) {
      val (agg, gm2) = SubsampleOps.subsample(cur, 2, chosen)
      val df2 = chosen.foldLeft(agg) { case (d, (v, m)) =>
        d.withColumnRenamed(s"${v}_$m", v)
      }
        .withColumn(cur.xCol, gm2.xExpr(col("block_i")))
        .withColumn(cur.yCol, gm2.yExpr(col("block_j")))
        .drop("block_i", "block_j")
      cur = Cube(df2, gm2, cur.timeCol, cur.yCol, cur.xCol)
      cur.df.write.mode("overwrite").parquet(levelPath(root, gms.result().size))
      gms += gm2
    }
    val out = gms.result()
    writeMeta(root, cube, out, chosen.toMap)
    out
  }

  def openLevel(spark: SparkSession, root: String, level: Int): DataFrame =
    spark.read.parquet(levelPath(root, level))

  def listLevels(spark: SparkSession, root: String): Seq[Int] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .collect { case s if s.matches("L\\d+") => s.drop(1).toInt }.sorted.toSeq
  }

  /** Pyramid-level pruning: the coarsest level still at least as fine as
    * the requested resolution (mldataset/abc.py:136-149 — a level is
    * passed over only when BOTH its x and y resolutions exceed the
    * request, so anisotropic pyramids resolve like the reference).
    */
  def levelForResolution(gms: Seq[GridMapping], res: Double): Int =
    levelForResolutionXY(gms.map(g => (g.xRes, g.yRes)), res)

  /** The shared (xRes, yRes) form — also serves `format("levels")`. */
  def levelForResolutionXY(rs: Seq[(Double, Double)], res: Double): Int = {
    val viol = rs.indexWhere { case (xr, yr) =>
      xr > res + 1e-12 && yr > res + 1e-12
    }
    if (viol < 0) rs.length - 1 else math.max(0, viol - 1)
  }
}

/** ComputedMultiLevelDataset (reference mldataset/computed.py:24-160):
  * pyramid levels defined by a user FUNCTION instead of materialized
  * tables — each level is a lazy view `fn(base, level)`, memoized per
  * level. Levels stay logical plans until an action, so Catalyst fuses the
  * level derivation with whatever query runs on top.
  */
final class ComputedLevels(base: Cube, maxLevel: Int,
                           fn: (Cube, Int) => Cube) {
  private val cache = scala.collection.concurrent.TrieMap.empty[Int, Cube]

  def numLevels: Int = maxLevel + 1

  def level(l: Int): Cube = {
    require(l >= 0 && l <= maxLevel, s"level $l outside 0..$maxLevel")
    if (l == 0) base else cache.getOrElseUpdate(l, fn(base, l))
  }

  def levelForResolution(res: Double): Int =
    LevelStore.levelForResolution((0 to maxLevel).map(level(_).gm), res)
}
