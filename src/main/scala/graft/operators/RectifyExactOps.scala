package graft.operators

import graft.cube.GridMapping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact rectification kernels — the reference's triangle-containment
  * algorithm (xcube/core/resampling/rectify.py:469-588 ij-image pass,
  * :743-817 interpolation pass) re-expressed relationally with the SAME
  * arithmetic, so outputs match the reference bit-for-bit on shared inputs.
  *
  * Reference shape: per source QUAD (2×2 neighboring swath pixels) test every
  * destination cell center in the quad's bbox against the two triangles
  * (p0,p1,p2) and (p3,p2,p1); a hit yields fractional source coordinates
  * (u, v) used to interpolate the variable (nearest / triangular / bilinear).
  * First quad hit wins per destination cell (scan order j, then i, triangle
  * A before B).
  *
  * Relational shape, same math, no kernels:
  *  1. quad assembly: each swath row explodes to the ≤4 quads it corners
  *     (map-side), then ONE groupBy on the quad key gathers the 4 corners.
  *  2. candidate expansion: each quad explodes over the destination cells of
  *     its own bbox — bounded by (src res / dst res)², exactly the
  *     reference's per-quad scan window.
  *  3. containment + interpolation: pure codegen'd column arithmetic
  *     (determinants, barycentric u/v, clamp) — the formulas from _fdet/_fu/
  *     _fv and _compute_var_image_for_dest_line verbatim.
  *  4. first-wins: ONE min_by shuffle on the destination cell key ordered by
  *     (qj, qi, triangle) — the relational equivalent of the sentinel check.
  */
object RectifyExactOps {

  /** Reference default tolerance (rectify.py:36). */
  val UvDelta: Double = 1e-3

  private def clamp01(c: Column): Column = greatest(least(c, lit(1.0)), lit(0.0))

  /** Rectify a swath keyed by integer source pixel (siCol, sjCol) carrying
    * irregular world coords (xcCol, ycCol) and one variable `varCol` onto
    * the regular grid `gm`. `mode` ∈ nearest | triangular | bilinear.
    * Returns (dst_i, dst_j, v) for every destination cell covered by a
    * source quad.
    */
  def rectify(src: DataFrame, siCol: String, sjCol: String,
              xcCol: String, ycCol: String, varCol: String,
              gm: GridMapping, mode: String,
              uvDelta: Double = UvDelta): DataFrame = {
    require(Seq("nearest", "triangular", "bilinear").contains(mode),
      s"invalid interpolation: $mode")

    // 1. quad assembly: corner (dc, dr) ∈ {0,1}² of quad (qi, qj)
    val corners = src
      .select(col(siCol).as("si"), col(sjCol).as("sj"),
        col(xcCol).cast("double").as("xc"), col(ycCol).cast("double").as("yc"),
        col(varCol).cast("double").as("v"))
      .withColumn("dc", explode(array(lit(0L), lit(1L))))
      .withColumn("dr", explode(array(lit(0L), lit(1L))))
      .withColumn("qi", col("si") - col("dc"))
      .withColumn("qj", col("sj") - col("dr"))
      .filter(col("qi") >= 0 && col("qj") >= 0)
    def corner(dc: Int, dr: Int, c: String) =
      max(when(col("dc") === dc && col("dr") === dr, col(c)))
    // p0 = (i0,j0), p1 = (i1,j0), p2 = (i0,j1), p3 = (i1,j1) — rectify.py:499
    val quads = corners.groupBy("qi", "qj").agg(
      count(lit(1)).as("nc"),
      corner(0, 0, "xc").as("x0"), corner(0, 0, "yc").as("y0"), corner(0, 0, "v").as("v0"),
      corner(1, 0, "xc").as("x1"), corner(1, 0, "yc").as("y1"), corner(1, 0, "v").as("v1"),
      corner(0, 1, "xc").as("x2"), corner(0, 1, "yc").as("y2"), corner(0, 1, "v").as("v2"),
      corner(1, 1, "xc").as("x3"), corner(1, 1, "yc").as("y3"), corner(1, 1, "v").as("v3")
    ).filter(col("nc") === 4)

    // 2. destination bbox of the quad (floor of the 4 corner coords, clipped)
    def pi(x: String) = floor((col(x) - lit(gm.xMin)) / lit(gm.xRes)).cast("long")
    def pj(y: String) = floor((col(y) - lit(gm.yMin)) / lit(gm.yRes)).cast("long")
    val boxed = quads
      .withColumn("di_min", greatest(least(pi("x0"), pi("x1"), pi("x2"), pi("x3")), lit(0L)))
      .withColumn("di_max", least(greatest(pi("x0"), pi("x1"), pi("x2"), pi("x3")), lit(gm.width - 1)))
      .withColumn("dj_min", greatest(least(pj("y0"), pj("y1"), pj("y2"), pj("y3")), lit(0L)))
      .withColumn("dj_max", least(greatest(pj("y0"), pj("y1"), pj("y2"), pj("y3")), lit(gm.height - 1)))
      .filter(col("di_min") <= col("di_max") && col("dj_min") <= col("dj_max"))

    // 3. determinants (rectify.py _fdet) + candidate cell explode
    def det(x0: String, y0: String, x1: String, y1: String, x2: String, y2: String) =
      (col(x0) - col(x1)) * (col(y0) - col(y2)) - (col(x0) - col(x2)) * (col(y0) - col(y1))
    val withDet = boxed
      .withColumn("det_a", det("x0", "y0", "x1", "y1", "x2", "y2"))
      .withColumn("det_b", det("x3", "y3", "x2", "y2", "x1", "y1"))
      .filter(col("det_a") =!= 0.0 || col("det_b") =!= 0.0)
    val cells = withDet
      .withColumn("dst_i", explode(sequence(col("di_min"), col("di_max"))))
      .withColumn("dst_j", explode(sequence(col("dj_min"), col("dj_max"))))
      .withColumn("dst_x", lit(gm.xMin) + (col("dst_i").cast("double") + 0.5) * lit(gm.xRes))
      .withColumn("dst_y", lit(gm.yMin) + (col("dst_j").cast("double") + 0.5) * lit(gm.yRes))

    // barycentric u/v per triangle (_fu/_fv): triangle A anchored at p0,
    // triangle B anchored at p3
    def fu(x0: String, y0: String, x2: String, y2: String) =
      ((col(x0) - col("dst_x")) * (col(y0) - col(y2)) -
       (col(y0) - col("dst_y")) * (col(x0) - col(x2)))
    def fv(x0: String, y0: String, x1: String, y1: String) =
      ((col(y0) - col("dst_y")) * (col(x0) - col(x1)) -
       (col(x0) - col("dst_x")) * (col(y0) - col(y1)))
    val uvMin = -uvDelta
    val uvMax = 1.0 + 2 * uvDelta
    val tested = cells
      .withColumn("u_a", fu("x0", "y0", "x2", "y2") / col("det_a"))
      .withColumn("v_a", fv("x0", "y0", "x1", "y1") / col("det_a"))
      .withColumn("in_a", col("det_a") =!= 0.0 &&
        col("u_a") >= uvMin && col("v_a") >= uvMin && (col("u_a") + col("v_a")) <= uvMax)
      .withColumn("u_b", fu("x3", "y3", "x1", "y1") / col("det_b"))
      .withColumn("v_b", fv("x3", "y3", "x2", "y2") / col("det_b"))
      .withColumn("in_b", col("det_b") =!= 0.0 &&
        col("u_b") >= uvMin && col("v_b") >= uvMin && (col("u_b") + col("v_b")) <= uvMax)
      .filter(col("in_a") || col("in_b"))
      // triangle A first (tri 0), then B (tri 1) — rectify.py:566-581
      .withColumn("tri", when(col("in_a"), lit(0)).otherwise(lit(1)))
      .withColumn("u", when(col("in_a"), clamp01(col("u_a")))
        .otherwise(lit(1.0) - clamp01(col("u_b"))))
      .withColumn("v", when(col("in_a"), clamp01(col("v_a")))
        .otherwise(lit(1.0) - clamp01(col("v_b"))))

    // interpolation (_compute_var_image_for_dest_line); the quad carries all
    // 4 corner values, so no join-back is needed. u/v are in [0,1] after
    // clamping, which makes the u=1 / v=1 boundary algebra coincide with the
    // reference's int()+remainder form.
    val u = col("u"); val v = col("v")
    val value = mode match {
      case "nearest" =>
        when(u > 0.5 && v > 0.5, col("v3"))
          .when(u > 0.5, col("v1"))
          .when(v > 0.5, col("v2"))
          .otherwise(col("v0"))
      case "triangular" =>
        when(u + v < 1.0,
          col("v0") + u * (col("v1") - col("v0")) + v * (col("v2") - col("v0")))
          .otherwise(
            col("v3") + (lit(1.0) - u) * (col("v2") - col("v3")) +
              (lit(1.0) - v) * (col("v1") - col("v3")))
      case "bilinear" =>
        val vu0 = col("v0") + u * (col("v1") - col("v0"))
        val vu1 = col("v2") + u * (col("v3") - col("v2"))
        vu0 + v * (vu1 - vu0)
    }

    // 4. first quad wins per destination cell: scan order (qj, qi, tri)
    val scored = tested.withColumn("__val", value)
    scored.groupBy(col("dst_i"), col("dst_j"))
      .agg(min_by(col("__val"), struct(col("qj"), col("qi"), col("tri"))).as("v"))
  }
}
