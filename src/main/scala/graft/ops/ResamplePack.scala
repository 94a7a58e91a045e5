package graft.ops

import graft.{GraftSession, QueryPack}
import graft.cube.GridMapping
import graft.operators.{AffineOps, RectifyExactOps, RectifyOps, ReprojectOps, SpatialOps, UtmOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial resampling pack (SURVEY §2.11): affine same-CRS resampling of the
  * events mean field from the 360×100 unit grid onto a 90×25 grid with 4×
  * coarser resolution — nearest (order 0) and bilinear (order 1) paths.
  */
object ResamplePack extends QueryPack {

  private val tgtGm = GridMapping(90, 25, 0.0, 0.0, 4.0, 4.0)

  /** Source cell table (i, j, v): per-cell time mean of the events cube.
    * The mean sums in DECIMAL (raw values are 2-decimal dollars — the cast
    * is exact) so the 6-decimal rounding can never land on an
    * engine-order-dependent midpoint: an sf0.1 verify run caught exactly
    * that flip in two cells with the plain double avg.
    */
  private def srcCells(s: SparkSession, d: String): DataFrame = {
    val c = CubePack.eventsCube(s, d)
    c.df.groupBy(c.gm.iExpr(c.x).as("i"), c.gm.jExpr(c.y).as("j"))
      .agg(round(sum(col("v").cast("decimal(28,12)")).cast("double") /
        count(lit(1)), 6).as("v"))
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

    // bicubic (spline order 3, cubic-convolution): at this grid alignment
    // fx = fy = 0.5 everywhere, so the kernel weights are the exact dyadic
    // rationals ±1/16, 9/16 — the oracle hardcodes them
    "q_affine_bicubic" -> ((s, d) => {
      AffineOps.resampleBicubic(srcCells(s, d), CubePack.gm, tgtGm, Seq("v"))
        .groupBy("tgt_j")
        .agg(count(lit(1)).as("n"),
          round(sum(col("v").cast("decimal(28,10)")), 6).cast("double").as("sum_v"))
    }),

    // quadratic (spline order 2): offset target grid so fx = fy = 0.75 —
    // kernel taps are the exact dyadic rationals 0.28125 / 0.6875 / 0.03125
    // (hardcoded in the oracle), distinguishing order 2 from bilinear,
    // which this alignment would NOT do at fx = 0.5
    "q_affine_quadratic" -> ((s, d) => {
      val tgtOff = GridMapping(89, 24, 0.25, 0.25, 4.0, 4.0)
      AffineOps.resampleQuadratic(srcCells(s, d), CubePack.gm, tgtOff, Seq("v"))
        .groupBy("tgt_j")
        .agg(count(lit(1)).as("n"),
          round(sum(col("v").cast("decimal(28,10)")), 6).cast("double").as("sum_v"))
    }),

    // recover_nan (affine.py:290-312): NaN cells planted on (i+j)%5 == 0;
    // the masked bilinear interpolates values and validity together, so a
    // target cell keeps a value as long as ANY corner is valid. CHECKSUM:
    // per-cell means over k ∈ {1,2,3,4} valid corners land EXACTLY on
    // 1e-6 midpoints when k = 2 (mean of two 6-decimal values), where
    // Spark and DuckDB round() diverge — so no per-cell rounding; instead
    // each mean is ×12 (the lcm of the possible k), which makes it
    // grid-valued, recovered exactly by the DECIMAL cast, and summed
    // associatively.
    "q_affine_recover_nan" -> ((s, d) => {
      val src = srcCells(s, d).withColumn("v",
        when((col("i") + col("j")) % 5 === 0, lit(Double.NaN))
          .otherwise(col("v")))
      AffineOps.resampleBilinear(src, CubePack.gm, tgtGm, Seq("v"),
          recoverNan = true)
        .groupBy("tgt_j")
        .agg(count(lit(1)).as("n"),
          sum(when(isnan(col("v")), 1L).otherwise(0L)).as("n_nan"),
          round(sum(when(!isnan(col("v")), col("v") * 12.0).otherwise(lit(0.0))
            .cast("decimal(28,10)")), 6).cast("double").as("sum_v12"))
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
    }),

    // resample_in_space dispatcher (spatial.py:28-261), same-CRS regular
    // DOWNSAMPLE route: 4× coarser target + aggregator="mean" → block
    // aggregation (the var-config aggregator path, affine.py:72-77)
    "q_resample_space" -> ((s, d) => {
      val out = SpatialOps.resampleInSpace(
        SpatialOps.RegularSource(srcCells(s, d), CubePack.gm),
        tgtGm, Seq("v"), aggregator = Some("mean"))
      // no final round: the decimal-sum/count mean is bit-identical in both
      // engines, while rounding it can DIVERGE at exact 7th-decimal
      // midpoints (Spark rounds the exact binary value, DuckDB rounds after
      // multiplying) -- observed at sf0.1
      out.select(col("i"), col("j"), col("v"))
    }),

    // dispatcher different-CRS route (spatial.py:225-261): regular
    // geographic source → regular web-mercator target. The coords transform
    // closed-form, become irregular, land in the downscale-then-rectify
    // branch (transformed res ≈ 111 km < the 445 km target cells).
    "q_resample_space_crs" -> ((s, d) => {
      val geoGm = GridMapping(360, 100, -180.0, -45.0, 1.0, 0.9, crs = "CRS84")
      val mercGm = GridMapping(90, 25, -20037600.0, -5621600.0,
        445280.0, 449728.0, crs = "EPSG:3857")
      val out = SpatialOps.resampleInSpace(
        SpatialOps.RegularSource(srcCells(s, d), geoGm), mercGm, Seq("v"))
      out.select(col("i"), col("j"), col("v")) // unrounded: see q_resample_space
    }),

    // dispatcher UTM route: regular geographic source (a 3.6°×2° window of
    // zone 32) → regular UTM EPSG:32632 target via the closed-form
    // transverse-mercator series; lands in downscale-then-rectify like any
    // different-CRS request
    "q_resample_space_utm" -> ((s, d) => {
      val geoGm = GridMapping(360, 100, 6.0, 44.0, 0.01, 0.02, crs = "CRS84")
      val utmGm = GridMapping(80, 60, 250000.0, 4860000.0, 4000.0, 4000.0,
        crs = "EPSG:32632")
      val out = SpatialOps.resampleInSpace(
        SpatialOps.RegularSource(srcCells(s, d), geoGm), utmGm, Seq("v"))
      out.select(col("i"), col("j"), col("v")) // unrounded: see q_resample_space
    }),

    // exact triangle-containment rectification (rectify.py:469-588,743-817):
    // quadratically warped swath onto a unit grid, triangular interpolation,
    // first-quad-wins — the oracle reproduces the barycentric arithmetic
    // term-for-term, so values must match to the last bit before rounding
    "q_rectify_triangular" -> ((s, d) => {
      val swath = srcCells(s, d).select(
        col("i").as("si"), col("j").as("sj"),
        (col("i").cast("double") + 0.5 + lit(0.2) * col("j").cast("double") +
          lit(0.001) * col("j").cast("double") * col("j").cast("double")).as("xc"),
        (col("j").cast("double") + 0.5 + lit(0.05) * col("i").cast("double")).as("yc"),
        col("v"))
      val gm = GridMapping(400, 120, 0.0, 0.0, 1.0, 1.0)
      RectifyExactOps.rectify(swath, "si", "sj", "xc", "yc", "v", gm, "triangular")
        .select(col("dst_i"), col("dst_j"), round(col("v"), 6).as("v"))
    })
  )

  /** Shared source-cell CTE body (events mean per unit cell). */
  private val cellsCte: String =
    """cells AS (
         SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                round(sum(value::DECIMAL(28,12))::DOUBLE / count(*), 6) AS v
         FROM events GROUP BY i, j)"""

  override def oracleSql: Map[String, String] = Map(
    "q_resample_space" ->
      s"""WITH $cellsCte
         SELECT floor((i + 0.5) / 4)::BIGINT AS i,
                floor((j + 0.5) / 4)::BIGINT AS j,
                sum(v::DECIMAL(28,12))::DOUBLE / count(*) AS v
         FROM cells GROUP BY 1, 2""",
    "q_resample_space_crs" ->
      s"""WITH $cellsCte,
         g AS (SELECT 6378137.0 * radians(-180.0 + (i + 0.5) * 1.0) AS mx,
                      6378137.0 * ln(tan(pi() / 4 + radians(-45.0 + (j + 0.5) * 0.9) / 2)) AS my,
                      v
               FROM cells),
         b AS (SELECT floor((mx - (-20037600.0)) / 445280.0)::BIGINT AS bi,
                      floor((my - (-5621600.0)) / 449728.0)::BIGINT AS bj,
                      avg(mx) AS ax, avg(my) AS ay,
                      sum(v::DECIMAL(28,12))::DOUBLE / count(*) AS v
               FROM g GROUP BY bi, bj)
         SELECT floor((ax - (-20037600.0)) / 445280.0)::BIGINT AS i,
                floor((ay - (-5621600.0)) / 449728.0)::BIGINT AS j,
                v
         FROM b
         WHERE ax >= -20037600.0 AND ax < 20037600.0
           AND ay >= -5621600.0 AND ay < 5621600.0""",
    "q_resample_space_utm" -> {
      // the SAME Scala doubles the Column expression embeds, interpolated
      // into the SQL so both engines share every series constant bit-for-bit
      import UtmOps.{A => UA, E2, Ep2, K0, M0, M2, M4, M6}
      s"""WITH $cellsCte,
         g AS (SELECT 6.0 + (i + 0.5) * 0.01 AS lon,
                      44.0 + (j + 0.5) * 0.02 AS lat, v
               FROM cells),
         t1 AS (SELECT radians(lat) AS phi, radians(lon - 9.0) AS lam, v FROM g),
         t2 AS (SELECT phi, lam, sin(phi) AS sinphi, cos(phi) AS cosphi,
                       tan(phi) AS tanphi, v
                FROM t1),
         t3 AS (SELECT phi, lam, sinphi, cosphi, tanphi, v,
                       $UA / sqrt(1.0 - $E2 * sinphi * sinphi) AS n,
                       tanphi * tanphi AS t,
                       $Ep2 * cosphi * cosphi AS c,
                       lam * cosphi AS a1,
                       $UA * ($M0 * phi - $M2 * sin(2.0 * phi)
                              + $M4 * sin(4.0 * phi) - $M6 * sin(6.0 * phi)) AS m
                FROM t2),
         t4 AS (SELECT v,
                       $K0 * n * (a1 + (1.0 - t + c) * (a1 * a1 * a1) / 6.0
                         + (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * $Ep2)
                           * ((a1 * a1) * (a1 * a1) * a1) / 120.0) + 500000.0 AS tx,
                       $K0 * (m + n * tanphi * ((a1 * a1) / 2.0
                         + (5.0 - t + 9.0 * c + 4.0 * c * c)
                           * ((a1 * a1) * (a1 * a1)) / 24.0
                         + (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * $Ep2)
                           * ((a1 * a1) * (a1 * a1) * (a1 * a1)) / 720.0)) + 0.0 AS ty
                FROM t3),
         b AS (SELECT floor((tx - 250000.0) / 4000.0)::BIGINT AS bi,
                      floor((ty - 4860000.0) / 4000.0)::BIGINT AS bj,
                      avg(tx) AS ax, avg(ty) AS ay,
                      sum(v::DECIMAL(28,12))::DOUBLE / count(*) AS v
               FROM t4 GROUP BY bi, bj)
         SELECT floor((ax - 250000.0) / 4000.0)::BIGINT AS i,
                floor((ay - 4860000.0) / 4000.0)::BIGINT AS j,
                v
         FROM b
         WHERE ax >= 250000.0 AND ax < 570000.0
           AND ay >= 4860000.0 AND ay < 5100000.0"""
    },
    "q_rectify_triangular" ->
      s"""WITH $cellsCte,
         sw AS (SELECT i AS si, j AS sj,
                       (i + 0.5) + 0.2 * j + 0.001 * j * j AS xc,
                       (j + 0.5) + 0.05 * i AS yc, v
                FROM cells),
         q AS (SELECT a.si AS qi, a.sj AS qj,
                      a.xc AS x0, a.yc AS y0, a.v AS v0,
                      b.xc AS x1, b.yc AS y1, b.v AS v1,
                      c.xc AS x2, c.yc AS y2, c.v AS v2,
                      d.xc AS x3, d.yc AS y3, d.v AS v3
               FROM sw a
               JOIN sw b ON b.si = a.si + 1 AND b.sj = a.sj
               JOIN sw c ON c.si = a.si AND c.sj = a.sj + 1
               JOIN sw d ON d.si = a.si + 1 AND d.sj = a.sj + 1),
         boxed AS (SELECT *,
                greatest(least(floor(x0), floor(x1), floor(x2), floor(x3))::BIGINT, 0) AS di_min,
                least(greatest(floor(x0), floor(x1), floor(x2), floor(x3))::BIGINT, 399) AS di_max,
                greatest(least(floor(y0), floor(y1), floor(y2), floor(y3))::BIGINT, 0) AS dj_min,
                least(greatest(floor(y0), floor(y1), floor(y2), floor(y3))::BIGINT, 119) AS dj_max,
                (x0 - x1) * (y0 - y2) - (x0 - x2) * (y0 - y1) AS det_a,
                (x3 - x2) * (y3 - y1) - (x3 - x1) * (y3 - y2) AS det_b
           FROM q),
         cand AS (SELECT boxed.*, ti.dst_i, tj.dst_j,
                         dst_i + 0.5 AS dx, dst_j + 0.5 AS dy
           FROM boxed,
                unnest(range(di_min, di_max + 1)) AS ti(dst_i),
                unnest(range(dj_min, dj_max + 1)) AS tj(dst_j)
           WHERE di_min <= di_max AND dj_min <= dj_max
             AND (det_a != 0 OR det_b != 0)),
         uv AS (SELECT *,
                ((x0 - dx) * (y0 - y2) - (y0 - dy) * (x0 - x2)) / det_a AS u_a,
                ((y0 - dy) * (x0 - x1) - (x0 - dx) * (y0 - y1)) / det_a AS v_a,
                ((x3 - dx) * (y3 - y1) - (y3 - dy) * (x3 - x1)) / det_b AS u_b,
                ((y3 - dy) * (x3 - x2) - (x3 - dx) * (y3 - y2)) / det_b AS v_b
           FROM cand),
         hit AS (SELECT *,
                (det_a != 0 AND u_a >= -0.001 AND v_a >= -0.001
                 AND u_a + v_a <= (1.0 + 2 * 0.001)) AS in_a,
                (det_b != 0 AND u_b >= -0.001 AND v_b >= -0.001
                 AND u_b + v_b <= (1.0 + 2 * 0.001)) AS in_b
           FROM uv),
         sel AS (SELECT dst_i, dst_j, qi, qj, v0, v1, v2, v3,
                CASE WHEN in_a THEN 0 ELSE 1 END AS tri,
                CASE WHEN in_a THEN greatest(least(u_a, 1.0), 0.0)
                     ELSE 1.0 - greatest(least(u_b, 1.0), 0.0) END AS u,
                CASE WHEN in_a THEN greatest(least(v_a, 1.0), 0.0)
                     ELSE 1.0 - greatest(least(v_b, 1.0), 0.0) END AS v
           FROM hit WHERE in_a OR in_b),
         vals AS (SELECT dst_i, dst_j, qi, qj, tri,
                CASE WHEN u + v < 1.0
                     THEN v0 + u * (v1 - v0) + v * (v2 - v0)
                     ELSE v3 + (1.0 - u) * (v2 - v3) + (1.0 - v) * (v1 - v3)
                END AS val
           FROM sel),
         r AS (SELECT *, row_number() OVER (PARTITION BY dst_i, dst_j
                         ORDER BY qj, qi, tri) AS rn FROM vals)
         SELECT dst_i, dst_j, round(val, 6) AS v FROM r WHERE rn = 1""",
    "q_affine_nearest" ->
      """WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(sum(value::DECIMAL(28,12))::DOUBLE / count(*), 6) AS v
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
                  round(sum(value::DECIMAL(28,12))::DOUBLE / count(*), 6) AS v
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
    "q_affine_quadratic" ->
      """WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(sum(value::DECIMAL(28,12))::DOUBLE / count(*), 6) AS v
           FROM events GROUP BY i, j),
         tgt AS (SELECT ti.tgt_i, tj.tgt_j
                 FROM (SELECT unnest(range(0, 89)) AS tgt_i) ti
                 CROSS JOIN (SELECT unnest(range(0, 24)) AS tgt_j) tj),
         interp AS (
           SELECT tgt.tgt_i, tgt.tgt_j,
                  sum(ox.wx * oy.wy * c.v) / sum(ox.wx * oy.wy) AS v
           FROM tgt
           CROSS JOIN (VALUES (0, 0.28125), (1, 0.6875), (2, 0.03125)) AS ox(di, wx)
           CROSS JOIN (VALUES (0, 0.28125), (1, 0.6875), (2, 0.03125)) AS oy(dj, wy)
           JOIN cells c ON c.i = 4 * tgt.tgt_i + 1 + ox.di
                       AND c.j = 4 * tgt.tgt_j + 1 + oy.dj
           GROUP BY tgt.tgt_i, tgt.tgt_j)
         SELECT tgt_j, count(*) AS n,
                round(sum(v::DECIMAL(28,10)), 6)::DOUBLE AS sum_v
         FROM interp GROUP BY tgt_j""",
    "q_affine_recover_nan" ->
      """WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(sum(value::DECIMAL(28,12))::DOUBLE / count(*), 6) AS v
           FROM events GROUP BY i, j),
         nc AS (SELECT i, j,
                       CASE WHEN (i + j) % 5 = 0 THEN 'NaN'::DOUBLE ELSE v END AS v
                FROM cells),
         tgt AS (SELECT ti.tgt_i, tj.tgt_j
                 FROM (SELECT unnest(range(0, 90)) AS tgt_i) ti
                 CROSS JOIN (SELECT unnest(range(0, 25)) AS tgt_j) tj),
         interp AS (
           SELECT tgt.tgt_i, tgt.tgt_j,
                  CASE WHEN abs(coalesce(
                         sum(CASE WHEN NOT isnan(c.v) THEN 0.25 END), 0.0)) <= 1e-8
                       THEN 'NaN'::DOUBLE
                       ELSE sum(CASE WHEN NOT isnan(c.v) THEN 0.25 * c.v END) /
                            sum(CASE WHEN NOT isnan(c.v) THEN 0.25 END)
                  END AS v
           FROM tgt
           CROSS JOIN (VALUES (0, 0), (1, 0), (0, 1), (1, 1)) AS o(di, dj)
           JOIN nc c ON c.i = 4 * tgt.tgt_i + 1 + o.di
                    AND c.j = 4 * tgt.tgt_j + 1 + o.dj
           GROUP BY tgt.tgt_i, tgt.tgt_j)
         SELECT tgt_j, count(*) AS n,
                sum(CASE WHEN isnan(v) THEN 1 ELSE 0 END)::BIGINT AS n_nan,
                round(sum((CASE WHEN NOT isnan(v) THEN v * 12.0 ELSE 0 END)::DECIMAL(28,10)),
                      6)::DOUBLE AS sum_v12
         FROM interp GROUP BY tgt_j""",
    "q_affine_bicubic" ->
      """WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(sum(value::DECIMAL(28,12))::DOUBLE / count(*), 6) AS v
           FROM events GROUP BY i, j),
         tgt AS (SELECT ti.tgt_i, tj.tgt_j
                 FROM (SELECT unnest(range(0, 90)) AS tgt_i) ti
                 CROSS JOIN (SELECT unnest(range(0, 25)) AS tgt_j) tj),
         interp AS (
           SELECT tgt.tgt_i, tgt.tgt_j,
                  sum(ox.wx * oy.wy * c.v) / sum(ox.wx * oy.wy) AS v
           FROM tgt
           CROSS JOIN (VALUES (-1, -0.0625), (0, 0.5625),
                              (1, 0.5625), (2, -0.0625)) AS ox(di, wx)
           CROSS JOIN (VALUES (-1, -0.0625), (0, 0.5625),
                              (1, 0.5625), (2, -0.0625)) AS oy(dj, wy)
           JOIN cells c ON c.i = 4 * tgt.tgt_i + 1 + ox.di
                       AND c.j = 4 * tgt.tgt_j + 1 + oy.dj
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
