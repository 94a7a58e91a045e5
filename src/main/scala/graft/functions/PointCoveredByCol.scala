package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Point-in-geometry predicate with a PER-ROW WKT column — the join-form
  * rasterize path (one geometry per feature row), where [[PointCoveredBy]]'s
  * foldable-WKT precondition doesn't hold. Replaces the last ScalaUDF on a
  * hot path: the generated code calls the static cover test on the primitive
  * doubles — no boxing, no row serialization, no UDF dispatch.
  *
  * Children: (wkt, x, y). The prepared geometry is cached per distinct WKT
  * per executor JVM (a feature table has few distinct geometries relative
  * to the cube rows joined against them). Null WKT → null (the standard
  * null-propagating expression contract); as a join/filter condition that
  * behaves exactly like the replaced UDF's `false` — the row doesn't match
  * — but differs under NOT(...), where null stays null.
  */
case class PointCoveredByCol(first: Expression, second: Expression,
                             third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_covered_by_col"

  override protected def nullSafeEval(w: Any, x: Any, y: Any): Any =
    PointCoveredByCol.covers(w.asInstanceOf[UTF8String],
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, x, y) =>
      s"${ev.value} = graft.functions.PointCoveredByCol.covers($w, $x, $y);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PointCoveredByCol =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointCoveredByCol {
  // per-thread prepared-geometry cache, keyed by the WKT text. Bounded: a
  // feature table is expected to have few distinct geometries, but a
  // degenerate join against millions of distinct WKTs must degrade to
  // re-parsing, not executor OOM. Per-thread LRU ([[LruCache]]): lock-free
  // on the per-row hot path, and overflow evicts only the coldest entries
  // instead of dropping the whole cache each batch.
  private val MaxEntries = 4096
  private val cache = LruCache.threadLocal[GeomPredicate](MaxEntries)

  /** Codegen entry point: called from generated Java on primitive doubles.
    * Never sees null — nullSafeEval/nullSafeCodeGen short-circuit null
    * children to a null result before reaching here.
    */
  def covers(wkt: UTF8String, x: Double, y: Double): Boolean =
    cache.get().get(wkt.toString, w => new GeomPredicate(w)).covers(x, y)
}
