package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DISTINCT n-token shingle strings of a token array in ONE pass:
  * `array_distinct(shinglesOf(w, n))` — first-encounter order, empty
  * array when the document is shorter than `n` tokens.
  *
  * Replaces the interpreted higher-order `transform` (per window: a
  * concat_ws over n element_at expression evaluations) followed by
  * array_distinct's second pass. Each window's bytes are assembled once
  * from per-row prefetched token bytes and deduplicated as they are
  * built.
  *
  * Bit-exact replication:
  *  - each shingle equals concat_ws(" ", w[i..i+n-1]) — non-null tokens
  *    joined by a single 0x20, null tokens skipped (unreachable through
  *    `tokens()`, mirrored anyway);
  *  - dedup keeps the FIRST occurrence of each value, exactly like
  *    array_distinct;
  *  - shorter-than-n inputs yield an EMPTY array, like the
  *    `when(size(w) >= n, ...).otherwise(array())` guard it replaces.
  */
case class DistinctShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"distinct_shingles expects array<string>, got $other")
    }

  override protected def nullSafeEval(a: Any): Any =
    DistinctShingles.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DistinctShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

object DistinctShingles {
  import org.apache.spark.sql.graft.ColumnBridge

  /** The per-row kernel shared by interpreted eval and the generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](len)
    var j = 0
    while (j < len) {
      tb(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j).getBytes
      j += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
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
      seen.add(UTF8String.fromBytes(buf))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Column form over a token-array column. */
  def col(w: Column, n: Int): Column =
    ColumnBridge.column(DistinctShingles(ColumnBridge.expression(w), n))
}
