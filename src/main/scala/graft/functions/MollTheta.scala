package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The Mollweide auxiliary angle θ(φ) solving 2θ + sin 2θ = π sin φ
  * (Snyder eq. 31-2..31-4) as a native codegen expression.
  *
  * The fold is a FIXED-COUNT pole-guarded Newton iteration from the
  * θ = φ seed — the same loop the scalar twin and the SQL oracle run,
  * so the three forms agree bit-for-bit. It must be an Expression, not
  * a Column construction: unrolling the iteration as nested Column
  * `when`s re-substitutes θ four times per step, an O(4^steps)
  * expression tree that blew the driver's heap at 8 steps; here the
  * loop is eight lines of generated Java regardless of step count. */
case class MollTheta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "moll_theta"

  override protected def nullSafeEval(input: Any): Any = {
    val phi = input.asInstanceOf[Double]
    val target = math.Pi * math.sin(phi)
    var theta = phi
    var k = 0
    while (k < MollTheta.Steps) {
      val dn = 2.0 + 2.0 * math.cos(2.0 * theta)
      if (dn > 1e-14)
        theta = theta -
          (2.0 * theta + math.sin(2.0 * theta) - target) / dn
      k += 1
    }
    theta
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, phi => {
      val tgt = ctx.freshName("tgt")
      val th = ctx.freshName("th")
      val dn = ctx.freshName("dn")
      val k = ctx.freshName("k")
      s"""
        double $tgt = java.lang.Math.PI * java.lang.Math.sin($phi);
        double $th = $phi;
        for (int $k = 0; $k < ${MollTheta.Steps}; $k++) {
          double $dn = 2.0 + 2.0 * java.lang.Math.cos(2.0 * $th);
          if ($dn > 1e-14) {
            $th = $th - (2.0 * $th + java.lang.Math.sin(2.0 * $th)
              - $tgt) / $dn;
          }
        }
        ${ev.value} = $th;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MollTheta =
    copy(child = newChild)
}

object MollTheta {
  /** Quadratic convergence from the θ = φ seed: 8 steps land past
    * machine precision everywhere the guarded denominator admits a
    * step; the poles are exact at the seed. */
  val Steps: Int = 8
}
