package graft.operators

import graft.functions.VarExpr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** evaluate_dataset (xcube/core/evaluate.py:16-152): compute new variables
  * from `expression` specs and mask them with `valid_pixel_expression`
  * specs, in dependency order.
  */
object Evaluate {

  /** One variable spec: either a computed expression, a validity mask over
    * an existing/computed var, or both (evaluate.py:63-116).
    */
  final case class VarConfig(
      name: String,
      expression: Option[String] = None,
      validPixelExpression: Option[String] = None)

  /** Order by the reference's dependency heuristic `_get_var_sort_key`
    * (evaluate.py:145-152): 10×len(expression) + 100×len(valid_pixel
    * expression) — shorter specs are assumed not to depend on longer ones,
    * and validity masks are weighted heavier so masked vars evaluate after
    * the vars their masks reference.
    */
  private def ordered(configs: Seq[VarConfig]): Seq[VarConfig] =
    configs.sortBy(c => 10 * c.expression.map(_.length).getOrElse(0) +
                        100 * c.validPixelExpression.map(_.length).getOrElse(0))

  def evaluateDataset(df: DataFrame, configs: Seq[VarConfig]): DataFrame =
    ordered(configs).foldLeft(df) { (d, cfg) =>
      val base = cfg.expression match {
        case Some(e) => VarExpr.onColumns(e)
        case None => col(cfg.name)
      }
      val value = cfg.validPixelExpression match {
        case Some(v) =>
          when(VarExpr.onColumns(v), base.cast("double")).otherwise(lit(Double.NaN))
        case None => base
      }
      d.withColumn(cfg.name, value)
    }

  /** "name = expr" single-assignment form (varexpr assignment splitting,
    * used by timeseries.py:122-127 / statistics controllers).
    */
  def withAssignment(df: DataFrame, assignment: String): (DataFrame, String) = {
    val (nameOpt, exprSrc) = VarExpr.parseAssignment(assignment)
    val name = nameOpt.getOrElse("_expr")
    (df.withColumn(name, VarExpr.onColumns(exprSrc)), name)
  }
}
