package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** The PQ-encode argmin for ONE subspace: over `cands` (code, centroid)
  * candidates, the code whose centroid minimizes the ROUNDED squared-L2
  * distance to the embedding's `[offset, offset+subDim)` slice, ties to
  * the lower code.
  *
  * Replaces the `array_min(array(struct(round(l2_sq(slice(emb,..), lit),
  * 6), code), ...))` Column tree, which inlines k l2_sq loops PER SUBSPACE
  * into the consuming operator's generated method — at m=8, k=16 the
  * m·k = 128 inlined loops passed the JVM's 64 KB method limit inside a
  * scan-fused stage (whose local-variable inputs defeat Spark's
  * expression splitting) and the whole stage silently fell back to
  * interpreted eval. Here each subspace is ONE compact loop over a
  * compiled double[] reference.
  *
  * Bit-exact replication of the replaced tree:
  *  - distance terms (x−y)² accumulated left-to-right in element order,
  *    doubles throughout — [[L2Sq]]'s documented order;
  *  - rounding replicates Spark's `Round(_, 6)` on DoubleType exactly:
  *    `BigDecimal.valueOf(d).setScale(6, HALF_UP).doubleValue()`
  *    (NaN/Infinity pass through unrounded, as in Spark's codegen);
  *  - the struct `array_min` is a lexicographic (dist, code) minimum —
  *    replicated by a strict `<` scan with the lower-code tiebreak;
  *  - a slice shorter than `subDim` (embedding too short) made l2_sq
  *    null-pad to a null distance; here the whole code is null, which the
  *    fixed-dimension contract (`pqTrain` requires dim % m == 0 over
  *    uniform embeddings) makes unreachable in practice.
  *
  * @param cands (code, centroid) in codebook order; centroid length must
  *              equal `subDim`
  */
case class PqArgminCode(child: Expression, cands: Seq[(Long, Array[Double])],
                        offset: Int, subDim: Int)
  extends UnaryExpression {

  require(cands.nonEmpty && cands.forall(_._2.length == subDim),
    s"every centroid must have length $subDim")

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_argmin_code"
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_argmin_code expects array<float|double>, got $other")
  }

  /** Centroids flattened row-major; codes aligned by candidate index. */
  private lazy val flatCents: Array[Double] =
    cands.iterator.flatMap(_._2).toArray
  private lazy val codes: Array[Long] = cands.map(_._1).toArray

  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < offset + subDim) return null
    val lf = elemIsFloat
    var bestD = Double.NaN
    var bestC = 0L
    var c = 0
    while (c < codes.length) {
      var acc = 0.0
      var i = 0
      while (i < subDim) {
        val xi = if (lf) x.getFloat(offset + i).toDouble
                 else x.getDouble(offset + i)
        val d = xi - flatCents(c * subDim + i)
        acc += d * d
        i += 1
      }
      val rd = round6(acc)
      // catalyst's double TOTAL order (NaN largest, -0.0 < 0.0) — what
      // array_min's struct comparison uses
      val cmp = java.lang.Double.compare(rd, bestD)
      if (c == 0 || cmp < 0 || (cmp == 0 && codes(c) < bestC)) {
        bestD = rd; bestC = codes(c)
      }
      c += 1
    }
    bestC
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val centsRef = ctx.addReferenceObj("pqCents", flatCents, "double[]")
    val codesRef = ctx.addReferenceObj("pqCodes", codes, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val bestD = ctx.freshName("bestD"); val bestC = ctx.freshName("bestC")
      val acc = ctx.freshName("acc"); val rd = ctx.freshName("rd")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val cmp = ctx.freshName("cmp")
      s"""
        if ($a.numElements() < ${offset + subDim}) {
          ${ev.isNull} = true;
        } else {
          double $bestD = Double.NaN;
          long $bestC = 0L;
          for (int $c = 0; $c < ${codes.length}; $c++) {
            double $acc = 0.0;
            for (int $i = 0; $i < $subDim; $i++) {
              double $d = ((double) $a.$get($offset + $i))
                - $centsRef[$c * $subDim + $i];
              $acc += $d * $d;
            }
            double $rd = (Double.isNaN($acc) || Double.isInfinite($acc))
              ? $acc
              : java.math.BigDecimal.valueOf($acc)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
            int $cmp = java.lang.Double.compare($rd, $bestD);
            // the || stays at END of line: enclosing codegen templates
            // stripMargin the assembled source, eating leading pipes
            if ($c == 0 || $cmp < 0 ||
                ($cmp == 0 && $codesRef[$c] < $bestC)) {
              $bestD = $rd; $bestC = $codesRef[$c];
            }
          }
          ${ev.value} = $bestC;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqArgminCode =
    copy(child = newChild)
}
