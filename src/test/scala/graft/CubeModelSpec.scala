package graft

import graft.cube.{Cube, GridMapping, NewCube}
import graft.functions.{GeomFunctions, MaskSet, VarExpr}
import graft.operators.{Evaluate, SelectOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CubeModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  test("GridMapping pixel/world math round-trips") {
    val gm = GridMapping.global1deg
    assert(gm.xForI(0) == -179.5)
    assert(gm.xForI(359) == 179.5)
    assert(gm.yForJ(0) == -89.5)
    assert(gm.iForX(-179.5) == 0)
    assert(gm.iForX(179.9) == 359)
    assert(gm.jForY(89.9) == 179)
    // ij bbox from xy bbox, mirrors base.py:527
    assert(gm.ijBboxFromXyBbox(-10.0, -10.0, 10.0, 10.0) == Some((170L, 80L, 190L, 100L)))
    assert(gm.ijBboxFromXyBbox(200.0, 95.0, 210.0, 99.0).isEmpty)
    // pyramid level sizes: size[l+1] = (size[l]+1)//2 (mldataset/abc.py:18)
    val l1 = gm.levelMapping(1)
    assert(l1.width == 180 && l1.height == 90 && l1.xRes == 2.0)
  }

  test("ijTransformTo/From mirrors base.py:429-489 (pixel-edge affine, " +
    "mixed j-axis conventions, inverse closure)") {
    val a = GridMapping(100, 80, 0.0, 0.0, 1.0, 1.0) // j up
    val b = GridMapping(60, 50, 10.0, 20.0, 2.0, 2.0, yDown = true)
    val t = a.ijTransformTo(b)
    // a's pixel edge (10, 20) is world (10, 20) = b's corner; b is
    // image-order so world y 20 (b's yMin... y_max side check):
    // b.yMax = 20 + 50*2 = 120; world (10, 20) -> i'=0, j'=(120-20)/2=50
    assert(t(10.0, 20.0) == ((0.0, 50.0)))
    // a's origin (0,0) = world (0,0): i' = -5, j' = 60 (outside, fine)
    assert(t(0.0, 0.0) == ((-5.0, 60.0)))
    // inverse closure + ijTransformFrom is the same matrix
    val ti = t.inverse
    val (bi, bj) = t(33.0, 41.0)
    assert(math.abs(ti(bi, bj)._1 - 33.0) < 1e-12)
    assert(math.abs(ti(bi, bj)._2 - 41.0) < 1e-12)
    val f = a.ijTransformFrom(b)
    assert(math.abs(f.sx - ti.sx) < 1e-12 && math.abs(f.ox - ti.ox) < 1e-12)
    assert(math.abs(f.sy - ti.sy) < 1e-12 && math.abs(f.oy - ti.oy) < 1e-12)
    // same j convention: plain scaling
    val c = GridMapping(50, 40, 0.0, 0.0, 2.0, 2.0)
    val t2 = a.ijTransformTo(c)
    assert(t2(10.0, 20.0) == ((5.0, 10.0)))
    // cross-CRS declines toward GmTransform
    intercept[IllegalArgumentException] {
      a.ijTransformTo(GridMapping(10, 10, 0.0, 0.0, 1.0, 1.0,
        crs = "EPSG:3857"))
    }
    ()
  }

  test("newCube builds the reference default fixture shape") {
    val c = NewCube(spark, timePeriods = 2)
    assert(c.verify().isEmpty)
    assert(c.df.count() == 2L * 180 * 360)
    val row = c.df.agg(min("x"), max("x"), min("y"), max("y"),
      min("precipitation"), max("precipitation")).head()
    assert(row.getDouble(0) == -179.5 && row.getDouble(1) == 179.5)
    assert(row.getDouble(2) == -89.5 && row.getDouble(3) == 89.5)
    assert(row.getDouble(4) == 0.6 && row.getDouble(5) == 0.6)
  }

  test("Cube.fromDataFrame infers the grid mapping") {
    val c0 = NewCube(spark, timePeriods = 1)
    val inferred = Cube.fromDataFrame(c0.df)
    assert(inferred.gm.width == 360 && inferred.gm.height == 180)
    assert(math.abs(inferred.gm.xRes - 1.0) < 1e-9)
    assert(math.abs(inferred.gm.xMin - (-180.0)) < 1e-9)
  }

  test("verify reports broken cubes") {
    val bad = Cube(spark.range(3).toDF("time"), GridMapping.global1deg)
    val issues = bad.verify()
    assert(issues.exists(_.contains("time")))
    assert(issues.exists(_.contains("missing coordinate")))
  }

  test("spatial + temporal subset") {
    val c = NewCube(spark, timePeriods = 3)
    val sub = SelectOps.selectSubset(c,
      vars = Some(Seq("precipitation")),
      bbox = Some((-10.0, -10.0, 10.0, 10.0)),
      timeRange = Some(("2010-01-01", "2010-01-02")))
    assert(sub.df.columns.toSeq == Seq("time", "y", "x", "precipitation"))
    // 20x20 cells, 2 time steps (Jan 1 and Jan 2 bins; end rounded up 1 day)
    assert(sub.df.count() == 20L * 20 * 2)
  }

  test("MaskSet bit spec parser (maskset.py:269-313)") {
    assert(MaskSet.parseBitSpec("5b") == 32L)
    assert(MaskSet.parseBitSpec("0b") == 1L)
    assert(MaskSet.parseBitSpec("3b-7b") == (8L | 16 | 32 | 64 | 128))
    assert(MaskSet.parseBitSpec("12") == 12L)
    val specs = MaskSet.flagSpecs("a b", Some(Seq("0b", "1b-2b")), None)
    assert(specs == Seq(MaskSet.FlagSpec("a", Some(1L), None),
                        MaskSet.FlagSpec("b", Some(6L), None)))
  }

  test("VarExpr compiles the reference grammar to Columns") {
    import spark.implicits._
    val df = Seq((4.0, 2.0, 3L), (100.0, -1.0, 12L)).toDF("a", "b", "f")
    def eval(e: String): Any =
      df.select(VarExpr.onColumns(e).as("r")).collect().map(_.get(0)).toSeq.head
    assert(eval("a + b * 2") == 8.0)
    assert(eval("a ** 0.5") == 2.0)
    assert(eval("-a ** 2") == -16.0) // python precedence: -(a**2)
    assert(eval("where(a > b, a, b)") == 4.0)
    assert(eval("a if a > 10 else b") == 2.0)
    assert(eval("sqrt(a) + log10(100)") == 4.0)
    assert(eval("1 < a <= 4") == true) // chained comparison
    assert(eval("f & 2") == 2L)
    assert(eval("f in (3, 5)") == true)
    assert(eval("not (a > 100)") == true)
    assert(eval("fmin(a, nan)") == 4.0)       // numpy fmin skips NaN
    val prop = df.select(VarExpr.onColumns("minimum(a, nan)").as("r"))
      .collect().head.getDouble(0)
    assert(prop.isNaN)                         // numpy minimum propagates
    assert(eval("clip(a, 0, 3)") == 3.0)
    assert(eval("a == nan") == false)          // numpy NaN comparison
    assert(eval("isnan(a)") == false)
    // assignment splitting
    assert(VarExpr.parseAssignment("chl = a + b") == (Some("chl"), " a + b"))
    assert(VarExpr.parseAssignment("a + b")._1.isEmpty)
    // non-whitelisted function rejected
    intercept[IllegalArgumentException](eval("__import__('os')"))
  }

  test("evaluate_dataset dependency order + valid pixel masking") {
    import spark.implicits._
    val df = Seq((10.0, 1.0), (200.0, -1.0)).toDF("v", "q")
    // reference sort key (evaluate.py:145-152): 10*len(expr) + 100*len(valid)
    // → small (60) before big (130) before masked (10 + 500)
    val out = Evaluate.evaluateDataset(df, Seq(
      Evaluate.VarConfig("big", expression = Some("v * 2 + small")),
      Evaluate.VarConfig("small", expression = Some("v / 10")),
      Evaluate.VarConfig("masked", expression = Some("v"),
        validPixelExpression = Some("q > 0"))))
    val rows = out.select("small", "big", "masked").collect()
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getDouble(1) == 21.0)
    assert(rows(0).getDouble(2) == 10.0)
    assert(rows(1).getDouble(0) == 20.0 && rows(1).getDouble(1) == 420.0)
    assert(rows(1).getDouble(2).isNaN)
  }

  test("VarExpr round digits, python % sign, nan only as bare literal") {
    import spark.implicits._
    val df = Seq((4.125, -7.0)).toDF("a", "b")
    def eval(e: String): Any =
      df.select(VarExpr.onColumns(e).as("r")).collect().map(_.get(0)).toSeq.head
    assert(eval("round(a, 2)") == 4.13)          // digits arg honored
    assert(eval("round(a)") == 4.0)
    intercept[IllegalArgumentException](eval("round(a, b)")) // non-literal digits
    assert(eval("b % 3") == 2.0)                 // python: sign of divisor
    assert(eval("7 % -3") == -2L)
    assert(eval("fmod(b, 3)") == -1.0)           // numpy fmod: truncated
    // nan comparison applies ONLY to the bare token (util/expression.py)
    assert(eval("a == nan") == false)
    val compound = df.select(VarExpr.onColumns("a == 1 + nan").as("r")).collect().head
    assert(compound.getBoolean(0) == false)      // NaN == compares, not isnan
    assert(eval("isnan(1 + nan)") == true)
  }

  test("VarExpr attribute/subscript/slice trailers (varexpr.py:16-309)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit, struct}
    val df = Seq((2.0, 5.0)).toDF("a", "b")
      .withColumn("bands", array(col("a"), col("b"), col("a") + col("b")))
      .withColumn("info", struct(col("a").as("raw"), (col("a") * 10).as("x10")))
    def eval(e: String): Any =
      df.select(VarExpr.onColumns(e).as("r")).collect().map(_.get(0)).toSeq.head
    assert(eval("bands[0]") == 2.0)              // 0-based
    assert(eval("bands[2]") == 7.0)
    assert(eval("bands[-1]") == 7.0)             // negative from the end
    assert(eval("bands[1 + 1]") == 7.0)          // computed index
    assert(eval("info.raw") == 2.0)              // attribute access
    assert(eval("info.x10 + bands[1]") == 25.0)
    assert(eval("bands[0:2][1]") == 5.0)         // half-open slice, chained
    assert(eval("bands[1:][0]") == 5.0)          // open upper bound
    assert(eval("bands[:2][0]") == 2.0)          // open lower bound
    assert(eval("sqrt(bands[2] + 2)") == 3.0)    // trailer inside a call
    intercept[Exception](eval("bands[0."))       // malformed trailer rejected
  }

  test("geometry predicate covers boundary and interior") {
    import spark.implicits._
    val wkt = "POLYGON ((0 0, 10 0, 0 10, 0 0))"
    val df = Seq((1.0, 1.0), (5.0, 5.0), (9.0, 2.0), (0.5, 0.5)).toDF("x", "y")
    val n = df.filter(GeomFunctions.geomMask(wkt)(col("x"), col("y"))).count()
    assert(n == 3) // (9,2) is outside (x+y=11); (5,5) on hypotenuse counts via covers
    assert(GeomFunctions.wktBbox(wkt) == (0.0, 0.0, 10.0, 10.0))
    assert(GeomFunctions.bboxToWkts(170.0, 0.0, -170.0, 10.0).size == 2) // anti-meridian
  }

  test("VarExpr.validate: the expressions validate/capabilities surface") {
    val vars = Set("chl", "tsm")
    assert(VarExpr.validate("sqrt(chl) + tsm * 2", vars).isRight)
    assert(VarExpr.validate("where(chl > 1, chl, nan)", vars).isRight)
    val unknown = VarExpr.validate("sqrt(bogus)", vars)
    assert(unknown.isLeft && unknown.left.exists(_.contains("bogus")))
    assert(VarExpr.validate("__import__('os')", vars).isLeft)
    assert(VarExpr.validate("chl +", vars).isLeft)
    assert(VarExpr.functionNames.contains("logaddexp"))
    // every advertised function actually compiles with dummy args
    VarExpr.functionNames.foreach { f =>
      val arity2 = Set("arctan2", "power", "pow", "hypot", "fmod", "fmin",
        "fmax", "minimum", "maximum", "logical_and", "logical_or", "add",
        "subtract", "multiply", "divide", "true_divide", "floor_divide",
        "mod", "remainder", "copysign", "logaddexp")
      val src = if (f == "where" || f == "clip") s"$f(chl, 1, 2)"
                else if (arity2.contains(f)) s"$f(chl, 2)"
                else s"$f(chl)"
      assert(VarExpr.validate(src, vars).isRight, s"$f failed")
    }
  }

  test("newCube bounds columns + SkewOps equivalence") {
    val c = NewCube(spark, gm = GridMapping(8, 4, 0.0, 0.0, 1.0, 1.0),
      timePeriods = 2, variables = Map("v" -> lit(1.0)), withBounds = true)
    assert(c.varNames == Seq("v")) // bounds are coords, not variables
    assert(c.verify().isEmpty)
    val r = c.df.filter(col("x") === 2.5).select("x_lower", "x_upper").head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0)
    // salted join/sum equal the plain forms
    import spark.implicits._
    val fact = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0))
      .toDF("k", "v")
    val dim = Seq(("a", 10L), ("b", 20L)).toDF("k", "w")
    val plain = fact.join(dim, "k").agg(sum(col("v") * col("w"))).head().getDouble(0)
    val salted = graft.operators.SkewOps.saltedJoin(fact, dim, "k", 4)
      .agg(sum(col("v") * col("w"))).head().getDouble(0)
    assert(plain == salted)
    val sums = graft.operators.SkewOps.saltedSum(fact, "k", "v", 4, "s")
      .collect().map(r2 => r2.getString(0) -> r2.getDouble(1)).toMap
    assert(sums == Map("a" -> 6.0, "b" -> 4.0))
  }
}
