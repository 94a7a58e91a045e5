package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native Catalyst expression for the point-in-geometry predicate
  * (SURVEY §4: the one custom expression the engine genuinely needs).
  *
  * Unlike the ScalaUDF form, this participates in WHOLE-STAGE CODEGEN: the
  * generated code calls the prepared-geometry test directly on the
  * primitive doubles — no boxing, no row serialization, no UDF dispatch on
  * the (bbox-prefiltered) survivor set. The `GeomPredicate` is shipped via
  * the codegen reference array; its JTS PreparedGeometry builds lazily once
  * per executor.
  */
case class PointCoveredBy(left: Expression, right: Expression, wkt: String)
  extends BinaryExpression {

  @transient private lazy val pred = new GeomPredicate(wkt)

  // callers (GeomFunctions.inGeom) cast both children to double
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_covered_by"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    pred.covers(x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val predRef = ctx.addReferenceObj("geomPred", pred, classOf[GeomPredicate].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $predRef.covers($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PointCoveredBy =
    copy(left = newLeft, right = newRight)
}
