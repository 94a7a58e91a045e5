package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The Equal Earth parametric angle θ solving
  * θ·(A1 + A2θ² + θ⁶(A3 + A4θ²)) = y/R_q
  * (Šavrič, Patterson & Jenny 2019, "The Equal Earth map projection" —
  * the inverse's Newton solve) as a native codegen expression, for the
  * same reason as [[MollTheta]]: an unrolled Column chain re-substitutes
  * θ many times per step, while the generated loop is a few lines of
  * Java at any step count. Input is the NORMALIZED northing y/R_q;
  * the on-map denominator A1 + 3A2θ² + θ⁶(7A3 + 9A4θ²) stays ≥ ~1.13,
  * so the guard only shields pathological off-map inputs. */
case class EqEarthTheta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "eqearth_theta"

  override protected def nullSafeEval(input: Any): Any = {
    val yn = input.asInstanceOf[Double]
    var theta = yn / EqEarthTheta.A1
    var k = 0
    while (k < EqEarthTheta.Steps) {
      val t2 = theta * theta
      val t6 = t2 * t2 * t2
      val f = theta * (EqEarthTheta.A1 + EqEarthTheta.A2 * t2 +
        t6 * (EqEarthTheta.A3 + EqEarthTheta.A4 * t2)) - yn
      val df = EqEarthTheta.A1 + 3.0 * EqEarthTheta.A2 * t2 +
        t6 * (7.0 * EqEarthTheta.A3 + 9.0 * EqEarthTheta.A4 * t2)
      if (math.abs(df) > 1e-14) theta = theta - f / df
      k += 1
    }
    theta
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, yn => {
      val th = ctx.freshName("th")
      val t2 = ctx.freshName("t2")
      val t6 = ctx.freshName("t6")
      val f = ctx.freshName("f")
      val df = ctx.freshName("df")
      val k = ctx.freshName("k")
      import EqEarthTheta.{A1, A2, A3, A4, Steps}
      s"""
        double $th = $yn / $A1;
        for (int $k = 0; $k < $Steps; $k++) {
          double $t2 = $th * $th;
          double $t6 = $t2 * $t2 * $t2;
          double $f = $th * ($A1 + $A2 * $t2 + $t6 * ($A3 + $A4 * $t2))
            - $yn;
          double $df = $A1 + 3.0 * $A2 * $t2
            + $t6 * (7.0 * $A3 + 9.0 * $A4 * $t2);
          if (java.lang.Math.abs($df) > 1e-14) { $th = $th - $f / $df; }
        }
        ${ev.value} = $th;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): EqEarthTheta =
    copy(child = newChild)
}

object EqEarthTheta {
  /** Published polynomial coefficients (Šavrič et al. 2019, eq. 1-3). */
  val A1: Double = 1.340264
  val A2: Double = -0.081106
  val A3: Double = 0.000893
  val A4: Double = 0.003796
  /** Newton from the y/(R·A1) seed: quadratic convergence, well past
    * machine precision on-map in far fewer than 8 steps. */
  val Steps: Int = 8
}
