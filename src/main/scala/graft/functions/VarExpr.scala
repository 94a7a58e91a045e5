package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Safe user-expression engine → Catalyst `Column` trees.
  *
  * Re-expression of the reference's two expression engines — the
  * AST-interpreting varexpr (xcube/core/varexpr/varexpr.py:16-309, names at
  * varexpr/names.py:13-43) and the numpy transpiler
  * (xcube/util/expression.py:10-372) — as ONE recursive-descent parser that
  * compiles directly to Spark Column expressions. Everything lands in
  * whole-stage codegen: no UDFs, no interpretation at row time.
  *
  * Grammar (python-ish, mirrors varexpr.py's whitelisted node set):
  *   ternary:  or_expr ['if' or_expr 'else' ternary]
  *   or/and/not, chained comparisons (a < b < c), `in (tuple)`,
  *   `is [not] None`, bit ops | ^ & << >>, + - * / // % unary+- ~ **,
  *   calls over a whitelisted numpy-ufunc registry, names, literals,
  *   constants nan/inf/e/pi/True/False/None, and postfix trailers
  *   `x.attr` (struct field), `x[i]` (0-based element, negative from the
  *   end) and `x[i:j]` (half-open slice) — the reference's Attribute/
  *   Subscript/slice whitelist.
  *
  * NaN semantics note: numpy's `x == nan` is always False while Spark treats
  * NaN == NaN as true; like the reference's transpiler
  * (util/expression.py `x == NAN` → isnan), comparisons against the `nan`
  * constant compile to isnan().
  */
object VarExpr {

  /** Parse "name = expr" assignment form (varexpr/__init__.py splitting,
    * used at timeseries.py:122-127): returns (Some(name), expr) or
    * (None, expr).
    */
  def parseAssignment(s: String): (Option[String], String) = {
    val m = "^\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*=(?!=)(.*)$".r
    s match {
      case m(name, rest) => (Some(name), rest)
      case _ => (None, s)
    }
  }

  /** Compile an expression over the given column resolver. */
  def compile(src: String, resolve: String => Column): Column =
    new Parser(tokenize(src), resolve).parseAll()

  /** Validate an expression against a set of known variable names without
    * running it — the expressions validate endpoint
    * (webapi/expressions/routes.py:21-42). Left(message) on rejection.
    */
  def validate(src: String, varNames: Set[String]): Either[String, Unit] =
    try {
      compile(src, name =>
        if (varNames.contains(name)) col(name)
        else throw new IllegalArgumentException(s"unknown variable '$name'"))
      Right(())
    } catch {
      case e: Exception => Left(Option(e.getMessage).getOrElse(e.toString))
    }

  /** The whitelisted function surface — the capabilities listing of the
    * expressions endpoint.
    */
  val functionNames: Seq[String] = Seq(
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arctan2",
    "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
    "exp", "expm1", "exp2", "log", "log2", "log10", "log1p", "logaddexp",
    "sqrt", "cbrt", "square", "abs", "fabs", "absolute", "sign",
    "floor", "ceil", "rint", "trunc", "round", "power", "pow", "hypot",
    "fmod", "deg2rad", "radians", "rad2deg", "degrees",
    "isnan", "isfinite", "isinf", "fmin", "fmax", "minimum", "maximum",
    "where", "clip", "logical_and", "logical_or", "logical_not",
    "negative", "positive", "add", "subtract", "multiply", "divide",
    "true_divide", "floor_divide", "mod", "remainder", "copysign")

  /** Compile over a DataFrame's columns by name. */
  def onColumns(src: String): Column = compile(src, col)

  // ---------------------------------------------------------------- lexer

  sealed trait Tok
  case class Num(v: String) extends Tok
  case class Str(v: String) extends Tok
  case class Name(v: String) extends Tok
  case class Op(v: String) extends Tok

  private val twoCharOps = Set("**", "//", "<<", ">>", "==", "!=", "<=", ">=")

  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val sb = new StringBuilder
        var seenE = false
        while (i < s.length && (s(i).isDigit || s(i) == '.' ||
               s(i) == 'e' || s(i) == 'E' ||
               ((s(i) == '+' || s(i) == '-') && seenE && (s(i - 1) == 'e' || s(i - 1) == 'E')))) {
          if (s(i) == 'e' || s(i) == 'E') seenE = true
          sb += s(i); i += 1
        }
        out += Num(sb.toString)
      } else if (c.isLetter || c == '_') {
        val sb = new StringBuilder
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) { sb += s(i); i += 1 }
        out += Name(sb.toString)
      } else if (c == '\'' || c == '"') {
        val q = c; i += 1
        val sb = new StringBuilder
        while (i < s.length && s(i) != q) { sb += s(i); i += 1 }
        require(i < s.length, s"unterminated string in: $s")
        i += 1
        out += Str(sb.toString)
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (twoCharOps(two)) { out += Op(two); i += 2 }
        else { out += Op(c.toString); i += 1 }
      }
    }
    out.result()
  }

  // --------------------------------------------------------------- parser

  final class Parser(toks: Vector[Tok], resolve: String => Column) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def eatOp(v: String): Boolean =
      peek match { case Some(Op(`v`)) => pos += 1; true; case _ => false }
    private def eatName(v: String): Boolean =
      peek match { case Some(Name(`v`)) => pos += 1; true; case _ => false }
    private def expectOp(v: String): Unit =
      require(eatOp(v), s"expected '$v' at token $pos in $toks")

    def parseAll(): Column = {
      val c = ternary()
      require(pos == toks.length, s"trailing tokens after position $pos in $toks")
      c
    }

    // value_if if cond else value_else
    private def ternary(): Column = {
      val value = orExpr()
      if (eatName("if")) {
        val cond = orExpr()
        require(eatName("else"), "ternary requires 'else'")
        val other = ternary()
        when(cond, value).otherwise(other)
      } else value
    }

    private def orExpr(): Column = {
      var c = andExpr()
      while (eatName("or")) c = c || andExpr()
      c
    }

    private def andExpr(): Column = {
      var c = notExpr()
      while (eatName("and")) c = c && notExpr()
      c
    }

    private def notExpr(): Column =
      if (eatName("not")) !notExpr() else comparison()

    /** Parse one comparison operand and report whether it was the BARE `nan`
      * token (single-token span) — only then does `x == nan` compile to
      * isnan(x) like the reference transpiler (util/expression.py). Compound
      * expressions containing nan (e.g. `1 + nan`, `(nan)`) compare normally.
      */
    private def cmpOperand(): (Column, Boolean) = {
      val start = pos
      val c = bitOr()
      val bareNan = pos == start + 1 && (toks(start) match {
        case Name("nan" | "NaN" | "NAN") => true
        case _ => false
      })
      (c, bareNan)
    }

    private def comparison(): Column = {
      var (left, leftNan) = cmpOperand()
      var result: Option[Column] = None
      var continue = true
      while (continue) {
        val opTok: Option[String] = peek match {
          case Some(Op(o)) if Set("==", "!=", "<", "<=", ">", ">=").contains(o) =>
            pos += 1; Some(o)
          case Some(Name("in")) => pos += 1; Some("in")
          case Some(Name("not")) => // not in
            pos += 1; require(eatName("in"), "'not' must be followed by 'in' here"); Some("not in")
          case Some(Name("is")) =>
            pos += 1; if (eatName("not")) Some("is not") else Some("is")
          case _ => None
        }
        opTok match {
          case None => continue = false
          case Some(o) if o == "in" || o == "not in" =>
            val items = tupleLiteral()
            val cmp = if (o == "in") left.isin(items: _*) else !left.isin(items: _*)
            result = Some(result.map(_ && cmp).getOrElse(cmp))
            continue = false
          case Some(o) if o == "is" || o == "is not" =>
            // only `is [not] None` is meaningful (varexpr blocks identity
            // checks on arrays anyway): right side must be the None literal
            peek match {
              case Some(Name("None")) => pos += 1
              case t => throw new IllegalArgumentException(s"'is' must compare to None, got $t")
            }
            val cmp = if (o == "is") left.isNull else left.isNotNull
            result = Some(result.map(_ && cmp).getOrElse(cmp))
            continue = false
          case Some(o) =>
            val (right, rightNan) = cmpOperand()
            val cmp = o match {
              case "==" =>
                if (rightNan) isnan(left) else if (leftNan) isnan(right) else left === right
              case "!=" =>
                if (rightNan) !isnan(left) else if (leftNan) !isnan(right) else left =!= right
              case "<"  => left < right
              case "<=" => left <= right
              case ">"  => left > right
              case ">=" => left >= right
            }
            result = Some(result.map(_ && cmp).getOrElse(cmp))
            left = right; leftNan = rightNan
        }
      }
      result.getOrElse(left)
    }

    /** Literal tuple for `in`: (v1, v2, ...) of numbers/strings. */
    private def tupleLiteral(): Seq[Any] = {
      expectOp("(")
      val items = Vector.newBuilder[Any]
      def item(): Any = next() match {
        case Num(v) =>
          if (v.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) v.toDouble else v.toLong
        case Str(v) => v
        case Op("-") => next() match {
          case Num(v) =>
            if (v.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) -v.toDouble else -v.toLong
          case t => throw new IllegalArgumentException(s"bad tuple item after '-': $t")
        }
        case t => throw new IllegalArgumentException(s"tuple items must be literals, got $t")
      }
      items += item()
      while (eatOp(",")) items += item()
      expectOp(")")
      items.result()
    }

    private def bitOr(): Column = {
      var c = bitXor()
      while (peek.contains(Op("|"))) { pos += 1; c = c.bitwiseOR(bitXor()) }
      c
    }
    private def bitXor(): Column = {
      var c = bitAnd()
      while (peek.contains(Op("^"))) { pos += 1; c = c.bitwiseXOR(bitAnd()) }
      c
    }
    private def bitAnd(): Column = {
      var c = shift()
      while (peek.contains(Op("&"))) { pos += 1; c = c.bitwiseAND(shift()) }
      c
    }
    private def shift(): Column = {
      var c = arith()
      var go = true
      while (go) peek match {
        case Some(Op("<<")) => pos += 1; c = shiftleft(c, arith())
        case Some(Op(">>")) => pos += 1; c = shiftright(c, arith())
        case _ => go = false
      }
      c
    }
    // the functions.shiftleft overload takes a literal Int; go through the
    // SQL builtin to accept a Column shift amount
    private def shiftleft(a: Column, b: Column): Column =
      call_function("shiftleft", a.cast("long"), b.cast("int"))
    private def shiftright(a: Column, b: Column): Column =
      call_function("shiftright", a.cast("long"), b.cast("int"))

    private def arith(): Column = {
      var c = term()
      var go = true
      while (go) peek match {
        case Some(Op("+")) => pos += 1; c = c + term()
        case Some(Op("-")) => pos += 1; c = c - term()
        case _ => go = false
      }
      c
    }

    private def term(): Column = {
      var c = factor()
      var go = true
      while (go) peek match {
        case Some(Op("*")) => pos += 1; c = c * factor()
        case Some(Op("/")) => pos += 1; c = c.cast("double") / factor()
        case Some(Op("//")) => pos += 1; c = floor(c / factor())
        // python/numpy % takes the divisor's sign, unlike Spark's remainder
        // (dividend sign) — same fold as the mod/remainder registry entries.
        case Some(Op("%")) => pos += 1; c = pymod(c, factor())
        case _ => go = false
      }
      c
    }

    // factor: ('+'|'-'|'~') factor | power   (python precedence)
    private def factor(): Column = peek match {
      case Some(Op("-")) => pos += 1; negate(factor())
      case Some(Op("+")) => pos += 1; factor()
      case Some(Op("~")) => pos += 1; bitwise_not(factor())
      case _ => power()
    }

    private def negate(c: Column): Column = lit(0) - c
    private def pymod(p: Column, q: Column): Column = ((p % q) + q) % q
    private def bitwise_not(c: Column): Column = -(c.cast("long")) - lit(1L)

    // power: atom ['**' factor]   (right-assoc)
    private def power(): Column = {
      val base = atom()
      if (eatOp("**")) pow(base, factor()) else base
    }

    private def atom(): Column = postfix {
      next() match {
        case Num(v) =>
          if (v.exists(ch => ch == '.' || ch == 'e' || ch == 'E')) lit(v.toDouble)
          else lit(v.toLong)
        case Str(v) => lit(v)
        case Op("(") =>
          val c = ternary()
          expectOp(")")
          c
        case Name(n) =>
          peek match {
            case Some(Op("(")) =>
              pos += 1
              // keep each arg's token span so functions needing a literal
              // argument (round digits) can recover it at compile time
              val args = Vector.newBuilder[(Column, (Int, Int))]
              if (!eatOp(")")) {
                def arg(): (Column, (Int, Int)) = {
                  val st = pos; val c = ternary(); (c, (st, pos))
                }
                args += arg()
                while (eatOp(",")) args += arg()
                expectOp(")")
              }
              call(n, args.result())
            case _ =>
              n match {
                case "nan" | "NaN" | "NAN" => lit(Double.NaN)
                case "inf" | "Inf" => lit(Double.PositiveInfinity)
                case "e" | "E" => lit(math.E)
                case "pi" | "PI" => lit(math.Pi)
                case "True" => lit(true)
                case "False" => lit(false)
                case "None" => lit(null)
                case _ => resolve(n)
              }
          }
        case t => throw new IllegalArgumentException(s"unexpected token $t")
      }
    }

    /** Postfix trailers — the reference grammar's whitelisted `Attribute`,
      * `Subscript` and slice nodes (varexpr.py:16-309):
      *   x.attr   → struct-field access
      *   x[i]     → 0-based array element (negative counts from the end,
      *              numpy-style), via 1-based element_at underneath
      *   x[i:j]   → half-open 0-based slice (either bound may be omitted),
      *              via slice(); bounds must be non-negative int literals
      */
    private def postfix(base: Column): Column = {
      var c = base
      var go = true
      while (go) peek match {
        case Some(Op(".")) =>
          pos += 1
          next() match {
            case Name(f) => c = c.getField(f)
            case t => throw new IllegalArgumentException(s"expected field name after '.', got $t")
          }
        case Some(Op("[")) =>
          pos += 1
          c = subscript(c)
        case _ => go = false
      }
      c
    }

    /** Optional non-negative int literal (slice bound). */
    private def sliceBound(): Option[Int] = peek match {
      case Some(Num(v)) if !v.exists(ch => ch == '.' || ch == 'e' || ch == 'E') =>
        pos += 1; Some(v.toInt)
      case _ => None
    }

    private def subscript(c: Column): Column = {
      // try the slice form first: [lo? : hi?]
      val save = pos
      val lo = sliceBound()
      if (eatOp(":")) {
        val hi = sliceBound()
        expectOp("]")
        val start = lo.getOrElse(0)
        hi match {
          case Some(h) =>
            slice(c, start + 1, math.max(0, h - start))
          case None => // x[i:] — to the end
            slice(c, lit(start + 1), greatest(size(c) - start, lit(0)))
        }
      } else {
        pos = save
        val idx = ternary()
        expectOp("]")
        // numpy 0-based (negative from the end) → element_at's 1-based
        element_at(c, (when(idx >= 0, idx + lit(1)).otherwise(idx)).cast("int"))
      }
    }

    /** Whitelisted function registry — varexpr/names.py's ufunc namespace
      * mapped to org.apache.spark.sql.functions (codegen'd builtins).
      */
    private def call(name: String, argsWithSpans: Seq[(Column, (Int, Int))]): Column = {
      val a = argsWithSpans.map(_._1)
      def one = { require(a.length == 1, s"$name takes 1 arg"); a.head }
      def two = { require(a.length == 2, s"$name takes 2 args"); (a(0), a(1)) }
      /** Literal integer value of argument i, when its token span is exactly
        * a (possibly sign-prefixed) numeric literal.
        */
      def litInt(i: Int): Option[Int] = {
        val (st, en) = argsWithSpans(i)._2
        toks.slice(st, en) match {
          case Vector(Num(v)) if !v.exists(ch => ch == '.' || ch == 'e' || ch == 'E') =>
            Some(v.toInt)
          case Vector(Op("-"), Num(v)) if !v.exists(ch => ch == '.' || ch == 'e' || ch == 'E') =>
            Some(-v.toInt)
          case _ => None
        }
      }
      name match {
        case "sin" => sin(one)
        case "cos" => cos(one)
        case "tan" => tan(one)
        case "arcsin" => asin(one)
        case "arccos" => acos(one)
        case "arctan" => atan(one)
        case "arctan2" => { val (p, q) = two; atan2(p, q) }
        case "sinh" => sinh(one)
        case "cosh" => cosh(one)
        case "tanh" => tanh(one)
        case "arcsinh" => asinh(one)
        case "arccosh" => acosh(one)
        case "arctanh" => atanh(one)
        case "exp" => exp(one)
        case "expm1" => expm1(one)
        case "exp2" => pow(lit(2.0), one)
        case "log" => log(one)
        case "log2" => log2(one)
        case "log10" => log10(one)
        case "log1p" => log1p(one)
        case "logaddexp" => // stable: max + log1p(exp(-|a-b|))
          val (p, q) = two
          val m = greatest(p, q); val n = least(p, q)
          when(isnan(p) || isnan(q), lit(Double.NaN)).otherwise(m + log1p(exp(n - m)))
        case "sqrt" => sqrt(one)
        case "cbrt" => cbrt(one)
        case "square" => one * one
        case "abs" | "fabs" | "absolute" => abs(one)
        case "sign" => signum(one)
        case "floor" => floor(one)
        case "ceil" => ceil(one)
        case "rint" => rint(one)
        case "trunc" => // toward zero
          when(one >= 0, floor(one)).otherwise(ceil(one))
        case "round" =>
          if (a.length == 2) {
            val digits = litInt(1).getOrElse(throw new IllegalArgumentException(
              "round(x, n): n must be an integer literal"))
            round(a(0), digits)
          } else round(one, 0)
        case "power" | "pow" => { val (p, q) = two; pow(p, q) }
        case "hypot" => { val (p, q) = two; hypot(p, q) }
        case "fmod" => { val (p, q) = two; p % q }
        case "deg2rad" | "radians" => radians(one)
        case "rad2deg" | "degrees" => degrees(one)
        case "isnan" => isnan(one)
        case "isfinite" => !isnan(one) && abs(one) =!= lit(Double.PositiveInfinity)
        case "isinf" => abs(one) === lit(Double.PositiveInfinity)
        // numpy fmin/fmax skip NaN; Spark orders NaN larger than any double,
        // so least() naturally skips NaN and greatest() needs a guard.
        case "fmin" => { val (p, q) = two; least(p, q) }
        case "fmax" => { val (p, q) = two
          when(isnan(p), q).when(isnan(q), p).otherwise(greatest(p, q)) }
        // numpy minimum/maximum PROPAGATE NaN.
        case "minimum" => { val (p, q) = two
          when(isnan(p) || isnan(q), lit(Double.NaN)).otherwise(least(p, q)) }
        case "maximum" => { val (p, q) = two
          when(isnan(p) || isnan(q), lit(Double.NaN)).otherwise(greatest(p, q)) }
        case "where" =>
          require(a.length == 3, "where takes 3 args")
          when(a(0), a(1)).otherwise(a(2))
        case "clip" =>
          require(a.length == 3, "clip takes 3 args")
          least(greatest(a(0), a(1)), a(2))
        case "logical_and" => { val (p, q) = two; p && q }
        case "logical_or" => { val (p, q) = two; p || q }
        case "logical_not" => !one
        case "negative" => negate(one)
        case "positive" => one
        case "add" => { val (p, q) = two; p + q }
        case "subtract" => { val (p, q) = two; p - q }
        case "multiply" => { val (p, q) = two; p * q }
        case "divide" | "true_divide" => { val (p, q) = two; p.cast("double") / q }
        case "floor_divide" => { val (p, q) = two; floor(p / q) }
        case "mod" | "remainder" => { val (p, q) = two; pymod(p, q) }
        case "copysign" => { val (p, q) = two
          abs(p) * when(q < 0, lit(-1.0)).otherwise(lit(1.0)) }
        case other =>
          throw new IllegalArgumentException(s"function '$other' is not whitelisted")
      }
    }
  }
}
