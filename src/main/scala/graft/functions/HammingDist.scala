package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Hamming distance over two equal-length strings (the
  * SimHash bit-fingerprint verification hot path) — the codegen twin of
  * the interpreted `aggregate(zip_with(split, split, !=))` HOF chain: one
  * byte-wise compare per position instead of two array materializations
  * and a lambda per element per candidate pair.
  *
  * Byte-wise is exact for the '0'/'1' fingerprints this serves (ASCII),
  * and matches DuckDB's per-character `substr(a,i,1) <> substr(b,i,1)`
  * count for any ASCII input. Unequal lengths yield null (the HOF form's
  * zip_with null-pad makes the sum null there too).
  */
case class HammingDist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_dist"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hamming_dist expects (string, string), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    if (x.length != y.length) return null
    var acc = 0L
    var i = 0
    while (i < x.length) {
      if (x(i) != y(i)) acc += 1L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb"); val yb = ctx.freshName("yb")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
        byte[] $xb = $a.getBytes();
        byte[] $yb = $b.getBytes();
        if ($xb.length != $yb.length) {
          ${ev.isNull} = true;
        } else {
          long $acc = 0L;
          for (int $i = 0; $i < $xb.length; $i++) {
            if ($xb[$i] != $yb[$i]) $acc++;
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDist =
    copy(left = newLeft, right = newRight)
}

object HammingDist {
  import org.apache.spark.sql.graft.ColumnBridge
  def col(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDist(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
