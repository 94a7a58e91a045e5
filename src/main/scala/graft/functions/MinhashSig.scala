package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The full MinHash signature for ONE document row: from the distinct
  * shingle array straight to the `numPerms`-long signature array, in one
  * pass over the shingles.
  *
  * Replaces the two-level higher-order-function tree
  * `array(array_min(transform(transform(sh, hash60), permuted(_, p))) × P)`
  * — higher-order functions are never whole-stage-codegen'd, so that form
  * walked the shingle array P+1 times through interpreted per-element
  * expression evaluation, materializing a hex md5 STRING per shingle and
  * re-parsing it with `conv(substring(…), 16, 10)`. Here each shingle is
  * MD5-hashed once (bytes, no hex round-trip) and all P permutation minima
  * fold in the same loop.
  *
  * Bit-exact replication of the replaced tree:
  *  - base hash = first 15 hex chars of md5(utf8(shingle)) parsed base-16
  *    ≡ the top 60 bits of the digest's first 8 bytes (big-endian >>> 4),
  *    identical to `TextOps.hash60`'s conv/substring arithmetic;
  *  - permuted value = ((h mod M)·A_p + B_p) mod M over the same LCG
  *    constants ([[MinhashSig.permA]]/[[permB]] — `TextOps.permuted`
  *    delegates to the same definitions, so they cannot drift);
  *  - `array_min` skips null elements and returns null when no non-null
  *    element exists — replicated: null shingles are skipped, and an
  *    empty/all-null shingle array yields an array of `numPerms` nulls
  *    (NOT a null array), exactly like the replaced `array(...)` literal;
  *  - a NULL shingle ARRAY yields a null result (the replaced tree gave
  *    an array of nulls there) — unreachable through `shingleArrays`,
  *    whose `size(w) >= n` filter drops null-text rows before this runs.
  */
case class MinhashSig(child: Expression, numPerms: Int)
  extends UnaryExpression {

  require(numPerms > 0, s"numPerms must be positive, got $numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got $other")
    }

  private lazy val pa: Array[Long] =
    Array.tabulate(numPerms)(MinhashSig.permA)
  private lazy val pb: Array[Long] =
    Array.tabulate(numPerms)(MinhashSig.permB)

  override protected def nullSafeEval(a: Any): Any =
    MinhashSig.compute(a.asInstanceOf[ArrayData], pa, pb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhPermA", pa, "long[]")
    val bRef = ctx.addReferenceObj("mhPermB", pb, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSig.compute($c, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Modulus of the universal-hash permutation family: 2^31 − 1 (prime).
    * Operands below 2^31 bound every product under 2^62 — overflow-free
    * int64 in Spark, DuckDB and here.
    */
  val PermModulus: Long = 2147483647L

  /** LCG-derived per-permutation multiplier (the single definition;
    * `TextOps.permuted` builds its Column form from the same values). */
  def permA(p: Int): Long = (1103515245L * (p + 1)) % PermModulus

  /** LCG-derived per-permutation offset. */
  def permB(p: Int): Long = (12345L * (p + 7919)) % PermModulus

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes): digest bytes 0..7 big-endian, >>> 4 —
    * numerically identical to parsing the first 15 hex chars base-16.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    h >>> 4
  }

  /** The per-row kernel, shared verbatim by interpreted eval and the
    * generated code (the call stays inside whole-stage codegen; the md5
    * work dwarfs one static dispatch per row).
    */
  def compute(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val np = a.length
    val mins = new Array[Long](np)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val hm = hash60(arr.getUTF8String(j).getBytes) % PermModulus
        var p = 0
        while (p < np) {
          val v = (hm * a(p) + b(p)) % PermModulus
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(new Array[Any](np))
    else new GenericArrayData(mins)
  }

  /** Column form: the signature array for a distinct-shingle array column. */
  def col(sh: Column, numPerms: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(sh), numPerms))
}
