package graft.plans

import graft.functions.{CosineSim, PointCoveredBy, PointCoveredByCol, WinnowFp}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** Spark extension wiring: registers the library's custom Catalyst
  * expressions as SQL functions, so `spark.sql("... cosine_sim(a, b) ...")`
  * works next to the Scala API. Loadable two ways:
  *
  *  - programmatically: `SparkSession.builder.withExtensions(new GraftExtensions)`
  *    (GraftSession does this), or
  *  - by config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (zero-arg class, the standard extension-jar contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) = {
    val _ = usage // kept for doc value; the non-deprecated ctor drops it
    new ExpressionInfo(classOf[GraftExtensions].getName, name)
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // resolution-based pyramid access (mldataset/abc.py:136-149) as an
    // optimizer rule: block-mean aggregations over a .levels base table
    // retarget to the matching coarser level's materialization
    ext.injectOptimizerRule(session => new PyramidRewrite(session))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(a, b) takes 2 arguments")
        CosineSim(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("winnow_fp"),
      info("winnow_fp", "winnow_fp(text, k, window) - winnowing rolling-hash fingerprints"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "winnow_fp(text, k, window) takes 3 arguments")
        WinnowFp(args(0), litInt(args(1), "k"), litInt(args(2), "window"))
      }))
    ext.injectFunction((FunctionIdentifier("point_covered_by"),
      info("point_covered_by", "point_covered_by(x, y, wkt) - point-in-geometry test"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "point_covered_by(x, y, wkt) takes 3 arguments")
        args(2) match {
          // literal WKT → geometry prepared at plan time, shipped via the
          // codegen reference array; column WKT → per-executor cache variant
          case Literal(s: UTF8String, _) => PointCoveredBy(args(0), args(1), s.toString)
          case wktCol => PointCoveredByCol(wktCol, args(0), args(1))
        }
      }))
  }
}
