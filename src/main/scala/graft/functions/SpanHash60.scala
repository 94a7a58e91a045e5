package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All n-token window hashes of a token array in ONE pass: element `i` is
  * `hash60(md5(utf8(concat_ws(" ", w[i..i+n-1]))))` — the ExactSubstr span
  * hash. Empty array when the document is shorter than `n` tokens.
  *
  * Replaces `shinglesOf(w, n)` + per-row `conv(substring(md5(__g),1,15),
  * 16,10)`: the shingle CONSTRUCTION was an interpreted higher-order
  * `transform` (per window: a concat_ws over n element_at expression
  * evaluations), and the shingle string itself was materialized only to
  * be hashed and thrown away. Here the token bytes are fetched once per
  * row and each window's md5 runs over an assembled byte buffer — no
  * UTF8String per window, no HOF, no hex round-trip.
  *
  * Bit-exact replication:
  *  - the md5 input equals the UTF8 bytes of the concat_ws(" ", ...)
  *    string: non-null tokens joined by a single 0x20 (concat_ws skips
  *    null elements — unreachable through `tokens()`, mirrored anyway);
  *  - the hash is the top 60 bits of the digest ([[MinhashSig.hash60]]),
  *    identical to parsing the first 15 hex chars base-16;
  *  - shorter-than-n inputs yield an EMPTY array, like the
  *    `when(size(w) >= n, ...).otherwise(array())` guard it replaces.
  */
case class SpanHash60(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"span length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_hash60"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_hash60 expects array<string>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any =
    SpanHash60.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanHash60.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): SpanHash60 =
    copy(child = newChild)
}

object SpanHash60 {
  import org.apache.spark.sql.graft.ColumnBridge

  /** The per-row kernel shared by interpreted eval and the generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    // fetch every token's bytes once; null tokens (unreachable through
    // tokens(), but concat_ws would skip them) are marked absent
    val tb = new Array[Array[Byte]](len)
    var j = 0
    while (j < len) {
      tb(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j).getBytes
      j += 1
    }
    val out = new Array[Long](len - n + 1)
    var i = 0
    while (i <= len - n) {
      var sz = 0
      var cnt = 0
      var k = 0
      while (k < n) {
        val b = tb(i + k)
        if (b != null) { sz += b.length; cnt += 1 }
        k += 1
      }
      val buf = new Array[Byte](if (cnt == 0) 0 else sz + cnt - 1)
      var off = 0
      var written = 0
      k = 0
      while (k < n) {
        val b = tb(i + k)
        if (b != null) {
          if (written > 0) { buf(off) = ' '.toByte; off += 1 }
          System.arraycopy(b, 0, buf, off, b.length)
          off += b.length
          written += 1
        }
        k += 1
      }
      out(i) = MinhashSig.hash60(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column form over a token-array column. */
  def col(w: Column, n: Int): Column =
    ColumnBridge.column(SpanHash60(ColumnBridge.expression(w), n))
}
