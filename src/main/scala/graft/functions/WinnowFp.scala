package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer et al., SIGMOD'03) with a TRUE
  * O(L) rolling hash: gram hashes follow the recurrence
  * `h' = ((h − c_out·B^(k−1)) · B + c_in) mod M`, which is residue-identical
  * to the per-gram polynomial sum the SQL oracle computes — modular integer
  * arithmetic is exact, so the relational HOF form, this expression and the
  * oracle all agree on every fingerprint.
  *
  * The HOF form costs O(L·k) interpreted lambda evaluations per document;
  * this expression is one compiled loop per row. Character codes are
  * UTF-16 units (identical to `ascii`/`ord` for the BMP text this corpus
  * holds).
  *
  * Returns the DISTINCT window minima in first-encounter order (set
  * semantics downstream — aggregations never depend on the order).
  */
case class WinnowFp(child: Expression, k: Int, window: Int)
  extends UnaryExpression with CodegenFallback {

  // SQL-callable via GraftExtensions: invalid k/window must fail at
  // analysis time, not as an ArrayIndexOutOfBounds mid-scan (window = 0
  // would make nWin = nGrams + 1 and read past hs)
  require(k >= 1, s"winnow_fp: k must be >= 1, got $k")
  require(window >= 1, s"winnow_fp: window must be >= 1, got $window")

  private val B = 257L
  private val M = 2147483647L
  /** B^(k−1) mod M. */
  private val topPow: Long = {
    var p = 1L
    (0 until k - 1).foreach(_ => p = p * B % M)
    p
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val L = s.length
    val nGrams = L - k + 1
    if (nGrams < window) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nGrams)
    // first gram: direct polynomial
    var h = 0L
    var j = 0
    while (j < k) { h = (h * B + s.charAt(j)) % M; j += 1 }
    hs(0) = h
    // remaining grams: rolling recurrence
    var i = 1
    while (i < nGrams) {
      var t = (h - (s.charAt(i - 1) * topPow) % M) % M
      if (t < 0) t += M
      h = (t * B + s.charAt(i + k - 1)) % M
      hs(i) = h
      i += 1
    }
    // window minima, distinct in first-encounter order (w is small: direct
    // scan per window beats deque bookkeeping for w ≤ ~16)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    val nWin = nGrams - window + 1
    while (i < nWin) {
      var m = hs(i)
      var w = 1
      while (w < window) { if (hs(i + w) < m) m = hs(i + w); w += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}
