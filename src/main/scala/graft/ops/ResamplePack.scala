package graft.ops

import graft.{GraftSession, QueryPack}
import graft.cube.GridMapping
import graft.operators.{AffineOps, RectifyOps, ReprojectOps}
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
      // checksum via EXACT decimal summation: double sums of grid-valued
      // interpolants can land exactly on a rounding midpoint, where
      // engine/run summation order flips the rounded value; decimal adds
      // are associative and both engines round decimals half-away-from-zero
      AffineOps.resampleBilinear(srcCells(s, d), CubePack.gm, tgtGm, Seq("v"))
        .groupBy("tgt_j")
        .agg(count(lit(1)).as("n"),
          round(sum(col("v").cast("decimal(28,10)")), 6).cast("double").as("sum_v"))
    }),

    // closed-form geographic → web-mercator reprojection; avg (not sum) so
    // libm ulp differences stay far inside the rounding margin
    "q_reproject_mercator" -> ((s, d) => {
      val c0 = CubePack.eventsCube(s, d)
      val geo = c0.copy(df = c0.df
        .withColumn("x", col("x") - 180.0)
        .withColumn("y", (col("y") - 50.0) * 0.9))
      ReprojectOps.toMercator(geo)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg(col("merc_x")), 4).as("avg_mx"),
          round(avg(col("merc_y")), 4).as("avg_my"))
    }),

    // rectify: irregular jittered coords back onto the regular grid —
    // nearest-to-center source wins per cell, deterministic tiebreak
    "q_rectify" -> ((s, d) => {
      val c0 = CubePack.eventsCube(s, d)
      val swath = GraftSession.events(s, d).select(
        (((col("event_id") % 360).cast("double") + 0.5) +
          ((col("event_id") % 7) - 3).cast("double") * 0.1).as("xc"),
        (((col("user_id") % 100).cast("double") + 0.5) +
          ((col("event_id") % 5) - 2).cast("double") * 0.1).as("yc"),
        col("value").as("v"), col("event_id"))
      RectifyOps.rectifyNearest(swath, "xc", "yc", c0.gm, Seq("v"), "event_id")
        .groupBy((col("j") / 10).cast("long").as("jband"))
        .agg(count(lit(1)).as("n_cells"), round(sum(col("v")), 6).as("sum_v"))
    }),

    // interpolating rectify (inverse-distance weights over the 3×3 cell
    // neighbourhood); per-cell values rounded to the 1e-6 grid before the
    // band checksum so the final sum is grid-valued (midpoint-safe)
    "q_rectify_idw" -> ((s, d) => {
      val c0 = CubePack.eventsCube(s, d)
      val swath = GraftSession.events(s, d).select(
        (((col("event_id") % 360).cast("double") + 0.5) +
          ((col("event_id") % 7) - 3).cast("double") * 0.1).as("xc"),
        (((col("user_id") % 100).cast("double") + 0.5) +
          ((col("event_id") % 5) - 2).cast("double") * 0.1).as("yc"),
        col("value").as("v"))
      RectifyOps.rectifyIdw(swath, "xc", "yc", c0.gm, Seq("v"))
        .select(col("i"), col("j"), round(col("v"), 6).as("v"))
        .groupBy((col("j") / 10).cast("long").as("jband"))
        .agg(count(lit(1)).as("n_cells"), round(sum(col("v")), 6).as("sum_v"))
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
         SELECT tgt_j, count(*) AS n,
                round(sum(v::DECIMAL(28,10)), 6)::DOUBLE AS sum_v
         FROM interp GROUP BY tgt_j""",
    "q_reproject_mercator" ->
      s"""WITH ${CubePack.cubeCte},
         g AS (SELECT event_type,
                      6378137.0 * radians(x - 180.0) AS mx,
                      6378137.0 * ln(tan(pi() / 4 + radians((y - 50.0) * 0.9) / 2)) AS my
               FROM cube)
         SELECT event_type, count(*) AS n,
                round(avg(mx), 4) AS avg_mx,
                round(avg(my), 4) AS avg_my
         FROM g GROUP BY event_type""",
    "q_rectify" ->
      """WITH sw AS (
           SELECT (CAST(event_id % 360 AS DOUBLE) + 0.5) +
                    CAST((event_id % 7) - 3 AS DOUBLE) * 0.1 AS xc,
                  (CAST(user_id % 100 AS DOUBLE) + 0.5) +
                    CAST((event_id % 5) - 2 AS DOUBLE) * 0.1 AS yc,
                  value AS v, event_id
           FROM events),
         f AS (SELECT floor(xc)::BIGINT AS i, floor(yc)::BIGINT AS j, xc, yc, v, event_id
               FROM sw WHERE xc >= 0 AND xc < 360 AND yc >= 0 AND yc < 100),
         d AS (SELECT *,
                      (xc - (i + 0.5)) * (xc - (i + 0.5)) +
                      (yc - (j + 0.5)) * (yc - (j + 0.5)) AS d2
               FROM f),
         r AS (SELECT *, row_number() OVER (PARTITION BY i, j
                         ORDER BY d2, event_id) AS rn FROM d)
         SELECT (j // 10)::BIGINT AS jband, count(*) AS n_cells,
                round(sum(v), 6) AS sum_v
         FROM r WHERE rn = 1 GROUP BY jband""",
    "q_rectify_idw" ->
      """WITH sw AS (
           SELECT (CAST(event_id % 360 AS DOUBLE) + 0.5) +
                    CAST((event_id % 7) - 3 AS DOUBLE) * 0.1 AS xc,
                  (CAST(user_id % 100 AS DOUBLE) + 0.5) +
                    CAST((event_id % 5) - 2 AS DOUBLE) * 0.1 AS yc,
                  value AS v
           FROM events),
         ex AS (
           SELECT floor(xc)::BIGINT + o.di AS i, floor(yc)::BIGINT + o.dj AS j,
                  xc, yc, v
           FROM sw CROSS JOIN (VALUES (-1, -1), (-1, 0), (-1, 1),
                                      (0, -1), (0, 0), (0, 1),
                                      (1, -1), (1, 0), (1, 1)) AS o(di, dj)
           WHERE floor(xc)::BIGINT + o.di >= 0 AND floor(xc)::BIGINT + o.di < 360
             AND floor(yc)::BIGINT + o.dj >= 0 AND floor(yc)::BIGINT + o.dj < 100),
         wgt AS (
           SELECT i, j, v,
                  1.0 / ((xc - (i + 0.5)) * (xc - (i + 0.5)) +
                         (yc - (j + 0.5)) * (yc - (j + 0.5)) + 1e-9) AS w
           FROM ex),
         cells AS (
           SELECT i, j, round(sum(w * v) / sum(w), 6) AS v
           FROM wgt GROUP BY i, j)
         SELECT (j // 10)::BIGINT AS jband, count(*) AS n_cells,
                round(sum(v), 6) AS sum_v
         FROM cells GROUP BY jband"""
  )
}
