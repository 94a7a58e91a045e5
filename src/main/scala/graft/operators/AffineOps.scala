package graft.operators

import graft.cube.GridMapping
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Affine spatial resampling between regular grids — the Spark re-expression
  * of the reference's `affine_transform_dataset` / `resample_in_space`
  * same-CRS path (xcube/core/resampling/affine.py:24-392, dispatcher
  * spatial.py:28-261).
  *
  * Instead of a per-block ndimage kernel, target-cell → source-cell
  * arithmetic is codegen'd column math and the gather is an equi-join on the
  * source cell key:
  *  - nearest: each target cell joins exactly its containing source cell
  *    (spline order 0, the integer-dtype default, affine.py:64-77).
  *  - bilinear: each target cell expands to its 4 surrounding source cells
  *    with (1−fx/fx)·(1−fy/fy) weights and re-normalizes over the neighbors
  *    actually present (spline order 1 float default + recover_nan-style
  *    weight renormalization).
  * Both shuffle only on the compact (i, j) cell key; at 100 TB the source
  * side is already bucketed by the partitioned layout and the exchange
  * coalesces under AQE.
  */
object AffineOps {

  /** Materialize the target grid's cell centers: (tgt_i, tgt_j, x, y). */
  def targetCells(spark: SparkSession, gm: GridMapping): DataFrame = {
    val w = gm.width
    spark.range(gm.width * gm.height).select(
      (col("id") % w).as("tgt_i"),
      (col("id") / w).cast("long").as("tgt_j"),
      gm.xExpr(col("id") % w).as("x"),
      gm.yExpr((col("id") / w).cast("long")).as("y"))
  }

  /** Nearest-neighbor resample. `srcCells` must be keyed by integer source
    * cell (i, j); missing cells produce NaN.
    */
  def resampleNearest(srcCells: DataFrame, srcGm: GridMapping,
                      tgtGm: GridMapping, vars: Seq[String]): DataFrame = {
    val spark = srcCells.sparkSession
    val tgt = targetCells(spark, tgtGm)
      .withColumn("si", srcGm.iExpr(col("x")))
      .withColumn("sj", srcGm.jExpr(col("y")))
    val joined = tgt.join(srcCells,
      col("si") === srcCells("i") && col("sj") === srcCells("j"), "left_outer")
    vars.foldLeft(joined) { (d, v) =>
      d.withColumn(v, coalesce(col(v).cast("double"), lit(Double.NaN)))
    }.drop("i", "j", "si", "sj")
  }

  /** Weighted-mean aggregate per variable for the corner-join resamplers.
    *
    * `recoverNan = true` mirrors the reference's recover_nan
    * (affine.py:290-312): NaN source values are zero-filled, the validity
    * mask is interpolated alongside, and the output is value/mask — i.e.
    * the weighted mean over the NON-NaN neighbors only, NaN where the
    * interpolated mask is ≈ 0 (isclose atol 1e-8, same constant). Without
    * it a single NaN source cell poisons every target cell it touches.
    */
  private def weightedAggs(vars: Seq[String], recoverNan: Boolean): Seq[Column] =
    vars.map { v =>
      if (recoverNan) {
        val vd = col(v).cast("double")
        val valid = !isnan(vd)
        val num = sum(when(valid, col("w") * vd).otherwise(lit(0.0)))
        val den = sum(when(valid, col("w")).otherwise(lit(0.0)))
        when(abs(den) <= 1e-8, lit(Double.NaN)).otherwise(num / den).as(v)
      } else
        (sum(col("w") * col(v).cast("double")) / sum(col("w"))).as(v)
    }

  /** Bicubic resample (spline order 3): 16-neighbor cubic-convolution
    * (Catmull-Rom kernel, a = −0.5 — the standard imaging "cubic"; scipy's
    * order-3 B-spline differs by its prefilter, documented trade-off).
    * Weights renormalize over present neighbors like the bilinear path.
    * Same shape as bilinear: a bounded 16× corner explode, one equi-join on
    * the source cell key, one map-side-combined groupBy.
    */
  def resampleBicubic(srcCells: DataFrame, srcGm: GridMapping,
                      tgtGm: GridMapping, vars: Seq[String],
                      recoverNan: Boolean = false): DataFrame = {
    def kernel(d: Column): Column = {
      val ad = abs(d)
      when(ad <= 1.0, (lit(1.5) * ad - lit(2.5)) * ad * ad + lit(1.0))
        .when(ad < 2.0, ((lit(-0.5) * ad + lit(2.5)) * ad - lit(4.0)) * ad + lit(2.0))
        .otherwise(lit(0.0))
    }
    kernelResample(srcCells, srcGm, tgtGm, vars, kernel, recoverNan)
  }

  /** Quadratic resample (spline order 2): 3-tap quadratic B-spline kernel
    * (0.75 − d² inside |d| ≤ 0.5; (1.5 − |d|)²/2 out to 1.5), applied as a
    * convolution without scipy's implicit-prefilter step — the same
    * documented smoothing-vs-interpolating trade-off as the order-3 path.
    */
  def resampleQuadratic(srcCells: DataFrame, srcGm: GridMapping,
                        tgtGm: GridMapping, vars: Seq[String],
                        recoverNan: Boolean = false): DataFrame = {
    def kernel(d: Column): Column = {
      val ad = abs(d)
      when(ad <= 0.5, lit(0.75) - ad * ad)
        .when(ad < 1.5, (lit(1.5) - ad) * (lit(1.5) - ad) * lit(0.5))
        .otherwise(lit(0.0))
    }
    kernelResample(srcCells, srcGm, tgtGm, vars, kernel, recoverNan)
  }

  /** Shared separable-kernel resampler: (di, dj) candidate corners from
    * `taps` (−1..2 covers support ≤ 4 taps — orders 2/3; −2..3 covers the
    * 5/6-tap order-4/5 kernels; out-of-support corners get weight 0 and are
    * pruned pre-join), one equi-join on the source cell key, one
    * map-side-combined aggregation.
    */
  private def kernelResample(srcCells: DataFrame, srcGm: GridMapping,
                             tgtGm: GridMapping, vars: Seq[String],
                             kernel: Column => Column,
                             recoverNan: Boolean,
                             taps: Seq[Long] = -1L to 2L): DataFrame = {
    val spark = srcCells.sparkSession
    val fi = (col("x") - lit(srcGm.xMin)) / lit(srcGm.xRes) - lit(0.5)
    val fj = (col("y") - lit(srcGm.yMin)) / lit(srcGm.yRes) - lit(0.5)
    val tgt = targetCells(spark, tgtGm)
      .withColumn("i0", floor(fi).cast("long"))
      .withColumn("j0", floor(fj).cast("long"))
      .withColumn("fx", fi - floor(fi))
      .withColumn("fy", fj - floor(fj))
    val offs = array(taps.map(lit): _*)
    val corners = tgt
      .withColumn("di", explode(offs))
      .withColumn("dj", explode(offs))
      .withColumn("w",
        kernel(col("di").cast("double") - col("fx")) *
          kernel(col("dj").cast("double") - col("fy")))
      .withColumn("si", col("i0") + col("di"))
      .withColumn("sj", col("j0") + col("dj"))
      // zero-weight corners (outside the kernel's support) carry nothing —
      // dropping them pre-join shrinks the join AND prevents a sparse-grid
      // target cell whose only PRESENT corners are zero-weight from
      // producing a 0/0 group (ANSI divide-by-zero)
      .filter(col("w") =!= 0.0)
    val joined = corners.join(srcCells,
      col("si") === srcCells("i") && col("sj") === srcCells("j"), "inner")
    val aggs = weightedAggs(vars, recoverNan)
    joined.groupBy(col("tgt_i"), col("tgt_j"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("x", tgtGm.xExpr(col("tgt_i")))
      .withColumn("y", tgtGm.yExpr(col("tgt_j")))
  }

  /** Quartic resample (spline order 4): 5-tap quartic B-spline kernel,
    * applied as a convolution without scipy's implicit prefilter — the same
    * documented smoothing-vs-interpolating trade-off as orders 2/3. The
    * Column arithmetic mirrors [[quarticWeight]] OPERATION FOR OPERATION so
    * driver-side doubles (oracle literals) are bit-equal to the plan's.
    */
  def resampleQuartic(srcCells: DataFrame, srcGm: GridMapping,
                      tgtGm: GridMapping, vars: Seq[String],
                      recoverNan: Boolean = false): DataFrame = {
    def kernel(d: Column): Column = {
      val ad = abs(d)
      val ad2 = ad * ad
      val ad4 = ad2 * ad2
      when(ad < 0.5, lit(115.0 / 192.0) - lit(0.625) * ad2 + lit(0.25) * ad4)
        .when(ad < 1.5,
          (lit(55.0) + lit(20.0) * ad - lit(120.0) * ad2 +
            lit(80.0) * (ad2 * ad) - lit(16.0) * ad4) / lit(96.0))
        .when(ad < 2.5, {
          val t = lit(5.0) - lit(2.0) * ad
          (t * t) * (t * t) / lit(384.0)
        })
        .otherwise(lit(0.0))
    }
    kernelResample(srcCells, srcGm, tgtGm, vars, kernel, recoverNan, -2L to 3L)
  }

  /** Quintic resample (spline order 5): 6-tap quintic B-spline kernel;
    * same convolution-without-prefilter convention; Column arithmetic
    * mirrors [[quinticWeight]] operation for operation.
    */
  def resampleQuintic(srcCells: DataFrame, srcGm: GridMapping,
                      tgtGm: GridMapping, vars: Seq[String],
                      recoverNan: Boolean = false): DataFrame = {
    def kernel(d: Column): Column = {
      val ad = abs(d)
      val ad2 = ad * ad
      val ad4 = ad2 * ad2
      when(ad < 1.0,
        (lit(66.0) - lit(60.0) * ad2 + lit(30.0) * ad4 -
          lit(10.0) * (ad4 * ad)) / lit(120.0))
        .when(ad < 2.0,
          (lit(51.0) + lit(75.0) * ad - lit(210.0) * ad2 +
            lit(150.0) * (ad2 * ad) - lit(45.0) * ad4 +
            lit(5.0) * (ad4 * ad)) / lit(120.0))
        .when(ad < 3.0, {
          val t = lit(3.0) - ad
          ((t * t) * (t * t)) * t / lit(120.0)
        })
        .otherwise(lit(0.0))
    }
    kernelResample(srcCells, srcGm, tgtGm, vars, kernel, recoverNan, -2L to 3L)
  }

  /** Plain-double twin of [[resampleQuartic]]'s kernel — IDENTICAL IEEE
    * operation order, so oracle literals generated from it are bit-equal to
    * what the plan computes (kept adjacent; ColumnKernelParitySpec pins it).
    */
  def quarticWeight(ad: Double): Double =
    if (ad < 0.5) 115.0 / 192.0 - 0.625 * (ad * ad) + 0.25 * ((ad * ad) * (ad * ad))
    else if (ad < 1.5)
      (55.0 + 20.0 * ad - 120.0 * (ad * ad) +
        80.0 * ((ad * ad) * ad) - 16.0 * ((ad * ad) * (ad * ad))) / 96.0
    else if (ad < 2.5) {
      val t = 5.0 - 2.0 * ad
      (t * t) * (t * t) / 384.0
    } else 0.0

  /** Plain-double twin of [[resampleQuintic]]'s kernel (same contract). */
  def quinticWeight(ad: Double): Double = {
    val ad2 = ad * ad
    val ad4 = ad2 * ad2
    if (ad < 1.0) (66.0 - 60.0 * ad2 + 30.0 * ad4 - 10.0 * (ad4 * ad)) / 120.0
    else if (ad < 2.0)
      (51.0 + 75.0 * ad - 210.0 * ad2 + 150.0 * (ad2 * ad) -
        45.0 * ad4 + 5.0 * (ad4 * ad)) / 120.0
    else if (ad < 3.0) {
      val t = 3.0 - ad
      ((t * t) * (t * t)) * t / 120.0
    } else 0.0
  }

  /** Bilinear resample: 4-neighbor weighted average, weights renormalized
    * over the neighbors present (NaN only when all 4 are missing).
    */
  def resampleBilinear(srcCells: DataFrame, srcGm: GridMapping,
                       tgtGm: GridMapping, vars: Seq[String],
                       recoverNan: Boolean = false): DataFrame = {
    val spark = srcCells.sparkSession
    // fractional source position of the target center, offset so that cell
    // CENTERS interpolate (affine.py half-pixel convention)
    val fi = (col("x") - lit(srcGm.xMin)) / lit(srcGm.xRes) - lit(0.5)
    val fj = (col("y") - lit(srcGm.yMin)) / lit(srcGm.yRes) - lit(0.5)
    val tgt = targetCells(spark, tgtGm)
      .withColumn("i0", floor(fi).cast("long"))
      .withColumn("j0", floor(fj).cast("long"))
      .withColumn("fx", fi - floor(fi))
      .withColumn("fy", fj - floor(fj))
    // expand to the 4 corners: (di, dj) ∈ {0,1}²
    val corners = tgt.withColumn("di", explode(array(lit(0L), lit(1L))))
      .withColumn("dj", explode(array(lit(0L), lit(1L))))
      .withColumn("w",
        (when(col("di") === 0, lit(1.0) - col("fx")).otherwise(col("fx"))) *
        (when(col("dj") === 0, lit(1.0) - col("fy")).otherwise(col("fy"))))
      .withColumn("si", col("i0") + col("di"))
      .withColumn("sj", col("j0") + col("dj"))
      // same zero-weight guard as kernelResample: at integer alignment
      // (fx = 0) the far corners carry weight 0 — a sparse grid whose only
      // PRESENT corners are zero-weight would otherwise 0/0 under ANSI
      .filter(col("w") =!= 0.0)
    val joined = corners.join(srcCells,
      col("si") === srcCells("i") && col("sj") === srcCells("j"), "inner")
    val aggs = weightedAggs(vars, recoverNan)
    joined.groupBy(col("tgt_i"), col("tgt_j"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("x", tgtGm.xExpr(col("tgt_i")))
      .withColumn("y", tgtGm.yExpr(col("tgt_j")))
  }
}
