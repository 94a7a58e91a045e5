package graft.ops

import graft.QueryPack
import graft.operators.ComputeOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-code + combination pack (SURVEY §2.10, §2.3): the per-block kernel
  * hook, the vars→dim reshape, and the multi-cube full-outer combiner —
  * each checked against a pure-SQL oracle.
  */
object ComputePack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // compute_cube: a per-block kernel that de-means v within its 64×64
    // block (the classic anomaly-from-block-climatology kernel)
    "q_compute_block" -> ((s, d) => {
      val c0 = CubePack.eventsCube(s, d)
      val cube = c0.copy(gm = c0.gm.copy(tileWidth = 64, tileHeight = 64))
      val outSchema = StructType(Seq(
        StructField("event_type", StringType),
        StructField("dev", DoubleType)))
      val out = ComputeOps.computeCube(cube, outSchema) { (_, rows) =>
        val rs = rows.toVector
        val vIdx = rs.head.fieldIndex("v")
        val etIdx = rs.head.fieldIndex("event_type")
        val mean = rs.map(_.getDouble(vIdx)).sum / rs.size
        rs.iterator.map(r => Row(r.getString(etIdx), r.getDouble(vIdx) - mean))
      }
      out.groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("dev")), 4).as("sum_dev"))
    }),

    // vars_to_dim: two variables reshaped into a (var, value) dimension
    "q_vars_to_dim" -> ((s, d) => {
      val c0 = CubePack.eventsCube(s, d)
      val cube = c0.copy(df = c0.df.withColumn("v2", col("v") * 2.0))
      ComputeOps.varsToDim(cube, Seq("v", "v2"))
        .groupBy("var")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),

    // CubesCombiner: full-outer merge of two spatially overlapping cubes
    // with variable union; NaN where a member has no cell
    "q_cube_merge" -> ((s, d) => {
      val c0 = CubePack.eventsCube(s, d)
      val base = c0.df.drop("event_type")
      val a = c0.copy(df = base.filter(col("x") < 180.0).withColumnRenamed("v", "va"))
      val b = c0.copy(df = base.filter(col("x") >= 90.0)
        .withColumn("vb", col("v") * 2.0).drop("v"))
      val merged = ComputeOps.combineCubes(Seq(a, b))
      merged.df.agg(
        count(lit(1)).as("n_total"),
        sum(when(!isnan(col("va")) && !isnan(col("vb")), 1).otherwise(0)).as("n_both"),
        sum(when(!isnan(col("va")) && isnan(col("vb")), 1).otherwise(0)).as("n_only_a"),
        sum(when(isnan(col("va")) && !isnan(col("vb")), 1).otherwise(0)).as("n_only_b"),
        round(sum(when(!isnan(col("va")), col("va")).otherwise(0.0)), 6).as("sum_va"),
        round(sum(when(!isnan(col("vb")), col("vb")).otherwise(0.0)), 6).as("sum_vb"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_compute_block" ->
      s"""WITH ${CubePack.cubeCte},
         b AS (SELECT event_type, v,
                      v - avg(v) OVER (PARTITION BY
                        (floor(y)::BIGINT // 64) * 6 + (floor(x)::BIGINT // 64)) AS dev
               FROM cube)
         SELECT event_type, count(*) AS n, round(sum(dev), 4) AS sum_dev
         FROM b GROUP BY event_type""",
    "q_vars_to_dim" ->
      s"""WITH ${CubePack.cubeCte},
         u AS (
           SELECT 'v' AS var, v AS value FROM cube
           UNION ALL
           SELECT 'v2' AS var, v * 2.0 AS value FROM cube)
         SELECT var, count(*) AS n, round(sum(value), 6) AS sum_value
         FROM u GROUP BY var""",
    "q_cube_merge" ->
      s"""WITH ${CubePack.cubeCte},
         a AS (SELECT time, y, x, v AS va FROM cube WHERE x < 180.0),
         b AS (SELECT time, y, x, v * 2.0 AS vb FROM cube WHERE x >= 90.0),
         m AS (SELECT a.va, b.vb FROM a FULL OUTER JOIN b
               ON a.time = b.time AND a.y = b.y AND a.x = b.x)
         SELECT count(*) AS n_total,
                sum(CASE WHEN va IS NOT NULL AND vb IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_both,
                sum(CASE WHEN va IS NOT NULL AND vb IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_only_a,
                sum(CASE WHEN va IS NULL AND vb IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_only_b,
                round(sum(coalesce(va, 0)), 6) AS sum_va,
                round(sum(coalesce(vb, 0)), 6) AS sum_vb
         FROM m"""
  )
}
