package graft.ops

import graft.{GraftSession, QueryPack}
import graft.cube.GridMapping
import graft.operators.AffineOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial resampling pack (SURVEY §2.11): affine same-CRS resampling of the
  * events mean field from the 360×100 unit grid onto a 90×25 grid with 4×
  * coarser resolution — nearest (order 0) and bilinear (order 1) paths.
  */
object ResamplePack extends QueryPack {

  private val tgtGm = GridMapping(90, 25, 0.0, 0.0, 4.0, 4.0)

  /** Source cell table (i, j, v): per-cell time mean of the events cube. */
  private def srcCells(s: SparkSession, d: String): DataFrame = {
    val c = CubePack.eventsCube(s, d)
    c.df.groupBy(c.gm.iExpr(c.x).as("i"), c.gm.jExpr(c.y).as("j"))
      .agg(round(avg(col("v")), 6).as("v"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_affine_nearest" -> ((s, d) => {
      AffineOps.resampleNearest(srcCells(s, d), CubePack.gm, tgtGm, Seq("v"))
        .groupBy("tgt_j")
        .agg(sum(when(!isnan(col("v")), 1).otherwise(0)).as("n_found"),
          round(sum(when(!isnan(col("v")), col("v")).otherwise(0.0)), 6).as("sum_v"))
    }),

    "q_affine_bilinear" -> ((s, d) => {
      AffineOps.resampleBilinear(srcCells(s, d), CubePack.gm, tgtGm, Seq("v"))
        .groupBy("tgt_j")
        .agg(count(lit(1)).as("n"), round(sum(col("v")), 6).as("sum_v"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_affine_nearest" ->
      """WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(avg(value), 6) AS v
           FROM events GROUP BY i, j),
         tgt AS (SELECT ti.tgt_i, tj.tgt_j
                 FROM (SELECT unnest(range(0, 90)) AS tgt_i) ti
                 CROSS JOIN (SELECT unnest(range(0, 25)) AS tgt_j) tj)
         SELECT tgt_j, count(c.v) AS n_found,
                round(sum(coalesce(c.v, 0)), 6) AS sum_v
         FROM tgt LEFT JOIN cells c
           ON c.i = 4 * tgt.tgt_i + 2 AND c.j = 4 * tgt.tgt_j + 2
         GROUP BY tgt_j""",
    "q_affine_bilinear" ->
      """WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(avg(value), 6) AS v
           FROM events GROUP BY i, j),
         tgt AS (SELECT ti.tgt_i, tj.tgt_j
                 FROM (SELECT unnest(range(0, 90)) AS tgt_i) ti
                 CROSS JOIN (SELECT unnest(range(0, 25)) AS tgt_j) tj),
         interp AS (
           SELECT tgt.tgt_i, tgt.tgt_j,
                  sum(0.25 * c.v) / sum(0.25) AS v
           FROM tgt
           CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) AS o(di, dj)
           JOIN cells c ON c.i = 4 * tgt.tgt_i + 1 + o.di
                       AND c.j = 4 * tgt.tgt_j + 1 + o.dj
           GROUP BY tgt.tgt_i, tgt.tgt_j)
         SELECT tgt_j, count(*) AS n, round(sum(v), 6) AS sum_v
         FROM interp GROUP BY tgt_j"""
  )
}
