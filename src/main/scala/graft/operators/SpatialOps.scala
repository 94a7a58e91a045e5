package graft.operators

import graft.cube.GridMapping
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `resample_in_space` dispatcher — the reference's public spatial-resample
  * entry point (xcube/core/resampling/spatial.py:28-261) re-expressed over
  * the relational grid model. The decision tree is the reference's:
  *
  *  1. source ≈ target           → no-op.
  *  2. same (or both geographic) CRS:
  *     a. regular source, upsample or same res → affine transform
  *        (spline order 0 = nearest join, 1 = bilinear 4-corner join).
  *     b. regular source, downsample + aggregator → block aggregation
  *        (the `aggregator` var-config path, affine.py:72-77).
  *     c. irregular source, src res ≥ tgt res (scale > 0.95) → rectify.
  *     d. irregular source, src res < tgt res → downscale (block mean of
  *        coords and values onto the target resolution) then rectify —
  *        spatial.py:198-223's downscale-first branch.
  *  3. different CRS → transform the source coordinates to the target CRS
  *     (closed-form geographic ↔ web-mercator; anything else raises, the
  *     documented CRS scope of v0) and recurse — the coords become irregular
  *     2-D, so this always lands in a rectify branch (spatial.py:225-261).
  *
  * Output is normalized to one row per populated target cell: (i, j, vars…).
  */
object SpatialOps {

  /** Reference `_SCALE_LIMIT`: below this src/tgt resolution ratio the
    * source must be downscaled before rectification.
    */
  val ScaleLimit: Double = 0.95

  /** A source for spatial resampling: either a regular cell table keyed by
    * integer (i, j), or an irregular swath carrying 2-D world coords.
    */
  sealed trait SpatialSource
  final case class RegularSource(cells: DataFrame, gm: GridMapping)
      extends SpatialSource
  final case class IrregularSource(df: DataFrame, xcCol: String, ycCol: String,
                                   xRes: Double, yRes: Double, crs: String)
      extends SpatialSource

  def isGeographic(crs: String): Boolean =
    Set("CRS84", "EPSG:4326", "WGS84", "OGC:CRS84").contains(crs)

  def sameCrs(a: String, b: String): Boolean =
    a == b || (isGeographic(a) && isGeographic(b))

  /** GridMapping.is_close analog (tolerance on every defining number). */
  def isClose(a: GridMapping, b: GridMapping, tol: Double = 1e-9): Boolean =
    a.width == b.width && a.height == b.height && sameCrs(a.crs, b.crs) &&
      math.abs(a.xMin - b.xMin) < tol && math.abs(a.yMin - b.yMin) < tol &&
      math.abs(a.xRes - b.xRes) < tol && math.abs(a.yRes - b.yRes) < tol

  /** Closed-form coordinate transform between the supported CRS pairs —
    * geographic ↔ each registered PROJECTED family: web-mercator
    * (EPSG:3857), any UTM zone (EPSG:326xx/327xx, [[UtmOps]]), polar
    * stereographic (EPSG:3413/3031/3976), LAEA (EPSG:3035/6931/6932),
    * MODIS sinusoidal (SR-ORG:6974), Lambert conformal conic
    * (EPSG:2154/3978) and Albers equal-area (EPSG:5070), all in
    * [[PolarOps]] unless noted.
    */
  /** Public coordinate transform between two registered CRSs —
    * geographic ↔ projected directly, projected → projected through the
    * geographic pivot. Loud decline for unregistered families. */
  def transformXY(crsFrom: String, crsTo: String,
                  x: Column, y: Column): (Column, Column) =
    transformCols(crsFrom, crsTo, x, y)

  private def transformCols(crsFrom: String, crsTo: String,
                            x: Column, y: Column): (Column, Column) = {
    /** (forward from geographic, inverse to geographic) of a projected
      * CRS, when registered. */
    def family(crs: String): Option[((Column, Column) => (Column, Column),
        (Column, Column) => (Column, Column))] =
      if (crs == "EPSG:3857") Some((
        (a, b) => (ReprojectOps.lonToMercX(a), ReprojectOps.latToMercY(b)),
        (a, b) => (ReprojectOps.mercXToLon(a), ReprojectOps.mercYToLat(b))))
      else UtmOps.zoneForCrs(crs).map(z => (
        (a: Column, b: Column) => UtmOps.forward(a, b, z),
        (a: Column, b: Column) => UtmOps.inverse(a, b, z)))
      .orElse(PolarOps.stereoForCrs(crs).map(ps => (
        (a: Column, b: Column) => PolarOps.stereoForward(a, b, ps),
        (a: Column, b: Column) => PolarOps.stereoInverse(a, b, ps))))
      .orElse(PolarOps.laeaForCrs(crs).map(la => (
        (a: Column, b: Column) => PolarOps.laeaForward(a, b, la),
        (a: Column, b: Column) => PolarOps.laeaInverse(a, b, la))))
      .orElse(PolarOps.lccForCrs(crs).map(lc => (
        (a: Column, b: Column) => PolarOps.lccForward(a, b, lc),
        (a: Column, b: Column) => PolarOps.lccInverse(a, b, lc))))
      .orElse(PolarOps.albersForCrs(crs).map(ab => (
        (a: Column, b: Column) => PolarOps.albersForward(a, b, ab),
        (a: Column, b: Column) => PolarOps.albersInverse(a, b, ab))))
      .orElse(if (PolarOps.isSinusoidal(crs)) Some((
        (a: Column, b: Column) => PolarOps.sinuForward(a, b),
        (a: Column, b: Column) => PolarOps.sinuInverse(a, b))) else None)
      .orElse(PolarOps.rotPoleForCrs(crs).map(rp => (
        (a: Column, b: Column) => PolarOps.rotPoleForward(a, b, rp),
        (a: Column, b: Column) => PolarOps.rotPoleInverse(a, b, rp))))
      .orElse(PolarOps.geosForCrs(crs).map(g => (
        (a: Column, b: Column) => PolarOps.geosForward(a, b, g),
        (a: Column, b: Column) => PolarOps.geosInverse(a, b, g))))
      .orElse(if (PolarOps.isEase2(crs)) Some((
        (a: Column, b: Column) => PolarOps.ease2Forward(a, b),
        (a: Column, b: Column) => PolarOps.ease2Inverse(a, b))) else None)
      .orElse(PolarOps.orthoForCrs(crs).map(o => (
        (a: Column, b: Column) => PolarOps.orthoForward(a, b, o),
        (a: Column, b: Column) => PolarOps.orthoInverse(a, b, o))))
      .orElse(PolarOps.mollForCrs(crs).map(mw => (
        (a: Column, b: Column) => PolarOps.mollForward(a, b, mw),
        (a: Column, b: Column) => PolarOps.mollInverse(a, b, mw))))
      .orElse(PolarOps.obliqueStereoForCrs(crs).map(os => (
        (a: Column, b: Column) => PolarOps.obliqueStereoForward(a, b, os),
        (a: Column, b: Column) => PolarOps.obliqueStereoInverse(a, b, os))))
      .orElse(PolarOps.eqEarthForCrs(crs).map(ee => (
        (a: Column, b: Column) => PolarOps.eqEarthForward(a, b, ee),
        (a: Column, b: Column) => PolarOps.eqEarthInverse(a, b, ee))))
      .orElse(PolarOps.hotineForCrs(crs).map(hm => (
        (a: Column, b: Column) => PolarOps.hotineForward(a, b, hm),
        (a: Column, b: Column) => PolarOps.hotineInverse(a, b, hm))))
      .orElse(PolarOps.mercForCrs(crs).map(mc => (
        (a: Column, b: Column) => PolarOps.mercForward(a, b, mc),
        (a: Column, b: Column) => PolarOps.mercInverse(a, b, mc))))
      .orElse(PolarOps.eqcForCrs(crs).map(q => (
        (a: Column, b: Column) => PolarOps.eqcForward(a, b, q),
        (a: Column, b: Column) => PolarOps.eqcInverse(a, b, q))))
      .orElse(PolarOps.tmercForCrs(crs).map(tmr => (
        (a: Column, b: Column) => PolarOps.tmercForward(a, b, tmr),
        (a: Column, b: Column) => PolarOps.tmercInverse(a, b, tmr))))
    if (sameCrs(crsFrom, crsTo)) (x, y)
    else (family(crsTo), family(crsFrom)) match {
      case (Some((fwd, _)), _) if isGeographic(crsFrom) => fwd(x, y)
      case (_, Some((_, inv))) if isGeographic(crsTo) => inv(x, y)
      case (Some((fwd, _)), Some((_, inv))) =>
        // projected -> projected: pivot through geographic (the same
        // route pyproj's pipeline takes for two non-geographic CRSs)
        val (lon, lat) = inv(x, y)
        fwd(lon, lat)
      case _ => throw new IllegalArgumentException(
        s"unsupported CRS pair $crsFrom -> $crsTo " +
          "(supported: geographic <-> EPSG:3857, UTM EPSG:326xx/327xx, " +
          "polar stereographic EPSG:3413/3031/3976, LAEA " +
          "EPSG:3035/6931/6932, MODIS sinusoidal SR-ORG:6974, " +
          "LCC EPSG:2154/3978, Albers EPSG:5070, ROTPOLE:<lat>:<lon>, " +
          "GEOS:<lon0>[:<h>:<x|y>], EASE-2.0 EPSG:6933, " +
          "ORTHO:<lat0>:<lon0>, MOLL:<lon0>)")
    }
  }

  /** Resample `src` onto the regular grid `tgtGm`.
    *
    * @param splineOrder 0 = nearest, 1 = bilinear, 2 = quadratic,
    *                    3 = bicubic, 4 = quartic, 5 = quintic (affine path).
    * @param aggregator  "mean" | "min" | "max" — used when a regular source
    *                    is DOWNSAMPLED (reference var-config `aggregator`);
    *                    None keeps the spline path.
    * @param tiebreak    deterministic tiebreak column for the rectify path.
    */
  def resampleInSpace(src: SpatialSource, tgtGm: GridMapping, vars: Seq[String],
                      splineOrder: Int = 1,
                      aggregator: Option[String] = None,
                      tiebreak: Option[String] = None): DataFrame = src match {

    case RegularSource(cells, gm) if isClose(gm, tgtGm) =>
      cells.select((col("i") +: col("j") +: vars.map(col)): _*)

    case RegularSource(cells, gm) if sameCrs(gm.crs, tgtGm.crs) =>
      val downsample = tgtGm.xRes > gm.xRes * (1.0 / ScaleLimit)
      (aggregator, downsample) match {
        case (Some(fn), true) =>
          // 2b: block aggregation of source cells into their target cell.
          // mean sums in DECIMAL: double summation order varies run-to-run
          // (and engine-to-engine), and a mean landing exactly on a rounding
          // midpoint flips the 6-decimal checksum — decimal adds are
          // associative, so the result is order-exact (repo convention).
          val agg: Column => Column = fn match {
            case "mean" => c =>
              sum(c.cast("decimal(28,12)")).cast("double") / count(lit(1))
            case "min"  => c => min(c)
            case "max"  => c => max(c)
            case other  => throw new IllegalArgumentException(s"aggregator: $other")
          }
          cells.groupBy(
              tgtGm.iExpr(gm.xExpr(col("i"))).as("i"),
              tgtGm.jExpr(gm.yExpr(col("j"))).as("j"))
            .agg(vars.map(v => agg(col(v).cast("double")).as(v)).head,
                 vars.map(v => agg(col(v).cast("double")).as(v)).tail: _*)
        case _ =>
          // 2a: affine transform at the requested spline order (0–5, the
          // reference's full ndimage range — affine.py:267)
          val out = splineOrder match {
            case 0 => AffineOps.resampleNearest(cells, gm, tgtGm, vars)
            case 1 => AffineOps.resampleBilinear(cells, gm, tgtGm, vars)
            case 2 => AffineOps.resampleQuadratic(cells, gm, tgtGm, vars)
            case 3 => AffineOps.resampleBicubic(cells, gm, tgtGm, vars)
            case 4 => AffineOps.resampleQuartic(cells, gm, tgtGm, vars)
            case 5 => AffineOps.resampleQuintic(cells, gm, tgtGm, vars)
            case n => throw new IllegalArgumentException(s"spline order $n (0..5)")
          }
          out.select((col("tgt_i").as("i") +: col("tgt_j").as("j") +:
            vars.map(col)): _*)
      }

    case RegularSource(cells, gm) =>
      // 3: different CRS — project the cell centers, recurse as irregular
      val (tx, ty) = transformCols(gm.crs, tgtGm.crs,
        gm.xExpr(col("i")), gm.yExpr(col("j")))
      val swath = cells.withColumn("__tx", tx).withColumn("__ty", ty)
      val (bx1, by1, bx2, by2) = transformedBbox(gm, tgtGm.crs)
      resampleInSpace(
        IrregularSource(swath, "__tx", "__ty",
          (bx2 - bx1) / gm.width, (by2 - by1) / gm.height, tgtGm.crs),
        tgtGm, vars, splineOrder, aggregator, tiebreak)

    case IrregularSource(df, xc, yc, xRes, yRes, crs) if sameCrs(crs, tgtGm.crs) =>
      val tb = tiebreak.getOrElse(xc)
      val xScale = xRes / tgtGm.xRes
      val yScale = yRes / tgtGm.yRes
      if (xScale > ScaleLimit && yScale > ScaleLimit)
        // 2c: source pixels at least as coarse as the target — rectify
        RectifyOps.rectifyNearest(df, xc, yc, tgtGm, vars, tb)
      else {
        // 2d: finer source — downscale onto the target resolution first
        // (block mean of coords AND values, the nanmean default), then
        // rectify the ≤1-sample-per-cell result. Coordinate means stay
        // double (they only feed floor-binning, ulp-tolerant); VALUE means
        // sum in DECIMAL for order-exactness (see 2b).
        val aggs = (avg(col(xc)).as(xc) +: avg(col(yc)).as(yc) +:
          vars.map(v =>
            (sum(col(v).cast("decimal(28,12)")).cast("double") / count(lit(1))).as(v)))
        val binned = df.groupBy(
            tgtGm.iExpr(col(xc)).as("__bi"), tgtGm.jExpr(col(yc)).as("__bj"))
          .agg(aggs.head, aggs.tail: _*)
          .drop("__bi", "__bj")
        RectifyOps.rectifyNearest(binned, xc, yc, tgtGm, vars, xc)
      }

    case IrregularSource(df, xc, yc, xRes, yRes, crs) =>
      // 3: different CRS — transform the 2-D coords and recurse
      val (tx, ty) = transformCols(crs, tgtGm.crs, col(xc), col(yc))
      val swath = df.withColumn("__tx", tx).withColumn("__ty", ty)
      // resolution estimate in the target CRS via the linear scale of the
      // transform at the extent (good enough for the route decision)
      val sx = scaleFactor(crs, tgtGm.crs)
      resampleInSpace(IrregularSource(swath, "__tx", "__ty",
        xRes * sx, yRes * sx, tgtGm.crs), tgtGm, vars, splineOrder, aggregator, tiebreak)
  }

  /** Bbox of a grid after transforming to `crsTo` (driver-side planning):
    * the min/max of the four transformed corners — exact for the conformal
    * cylindrical pair, a close planning estimate for transverse mercator.
    */
  def transformedBbox(gm: GridMapping, crsTo: String): (Double, Double, Double, Double) =
    if (sameCrs(gm.crs, crsTo)) gm.xyBbox
    else if (isGeographic(gm.crs) && crsTo == "EPSG:3857")
      ReprojectOps.mercatorBbox(gm)
    else if (gm.crs == "EPSG:3857" && isGeographic(crsTo)) {
      def lon(x: Double) = math.toDegrees(x / ReprojectOps.EarthRadius)
      def lat(y: Double) = math.toDegrees(
        2.0 * math.atan(math.exp(y / ReprojectOps.EarthRadius)) - math.Pi / 2)
      (lon(gm.xMin), lat(gm.yMin), lon(gm.xMax), lat(gm.yMax))
    } else {
      def familyScalar(crs: String)
          : Option[((Double, Double) => (Double, Double),
            (Double, Double) => (Double, Double))] =
        UtmOps.zoneForCrs(crs).map(z => (
          (a: Double, b: Double) => UtmOps.forwardScalar(a, b, z),
          (a: Double, b: Double) => UtmOps.inverseScalar(a, b, z)))
        .orElse(PolarOps.stereoForCrs(crs).map(ps => (
          (a: Double, b: Double) => PolarOps.stereoForwardScalar(a, b, ps),
          (a: Double, b: Double) => PolarOps.stereoInverseScalar(a, b, ps))))
        .orElse(PolarOps.laeaForCrs(crs).map(la => (
          (a: Double, b: Double) => PolarOps.laeaForwardScalar(a, b, la),
          (a: Double, b: Double) => PolarOps.laeaInverseScalar(a, b, la))))
        .orElse(PolarOps.lccForCrs(crs).map(lc => (
          (a: Double, b: Double) => PolarOps.lccForwardScalar(a, b, lc),
          (a: Double, b: Double) => PolarOps.lccInverseScalar(a, b, lc))))
        .orElse(PolarOps.albersForCrs(crs).map(ab => (
          (a: Double, b: Double) => PolarOps.albersForwardScalar(a, b, ab),
          (a: Double, b: Double) => PolarOps.albersInverseScalar(a, b, ab))))
        .orElse(if (PolarOps.isSinusoidal(crs)) Some((
          (a: Double, b: Double) => PolarOps.sinuForwardScalar(a, b),
          (a: Double, b: Double) => PolarOps.sinuInverseScalar(a, b)))
        else None)
        .orElse(PolarOps.rotPoleForCrs(crs).map(rp => (
          (a: Double, b: Double) => PolarOps.rotPoleForwardScalar(a, b, rp),
          (a: Double, b: Double) => PolarOps.rotPoleInverseScalar(a, b, rp))))
        .orElse(PolarOps.geosForCrs(crs).map(g => (
          (a: Double, b: Double) => PolarOps.geosForwardScalar(a, b, g),
          (a: Double, b: Double) => PolarOps.geosInverseScalar(a, b, g))))
        .orElse(if (PolarOps.isEase2(crs)) Some((
          (a: Double, b: Double) => PolarOps.ease2ForwardScalar(a, b),
          (a: Double, b: Double) => PolarOps.ease2InverseScalar(a, b)))
        else None)
        .orElse(PolarOps.orthoForCrs(crs).map(o => (
          (a: Double, b: Double) => PolarOps.orthoForwardScalar(a, b, o),
          (a: Double, b: Double) => PolarOps.orthoInverseScalar(a, b, o))))
        .orElse(PolarOps.mollForCrs(crs).map(mw => (
          (a: Double, b: Double) => PolarOps.mollForwardScalar(a, b, mw),
          (a: Double, b: Double) => PolarOps.mollInverseScalar(a, b, mw))))
        .orElse(PolarOps.obliqueStereoForCrs(crs).map(os => (
          (a: Double, b: Double) =>
            PolarOps.obliqueStereoForwardScalar(a, b, os),
          (a: Double, b: Double) =>
            PolarOps.obliqueStereoInverseScalar(a, b, os))))
        .orElse(PolarOps.eqEarthForCrs(crs).map(ee => (
          (a: Double, b: Double) => PolarOps.eqEarthForwardScalar(a, b, ee),
          (a: Double, b: Double) =>
            PolarOps.eqEarthInverseScalar(a, b, ee))))
        .orElse(PolarOps.hotineForCrs(crs).map(hm => (
          (a: Double, b: Double) => PolarOps.hotineForwardScalar(a, b, hm),
          (a: Double, b: Double) =>
            PolarOps.hotineInverseScalar(a, b, hm))))
        .orElse(PolarOps.mercForCrs(crs).map(mc => (
          (a: Double, b: Double) => PolarOps.mercForwardScalar(a, b, mc),
          (a: Double, b: Double) => PolarOps.mercInverseScalar(a, b, mc))))
        .orElse(PolarOps.eqcForCrs(crs).map(q => (
          (a: Double, b: Double) => PolarOps.eqcForwardScalar(a, b, q),
          (a: Double, b: Double) => PolarOps.eqcInverseScalar(a, b, q))))
        .orElse(PolarOps.tmercForCrs(crs).map(tmr => (
          (a: Double, b: Double) => PolarOps.tmercForwardScalar(a, b, tmr),
          (a: Double, b: Double) =>
            PolarOps.tmercInverseScalar(a, b, tmr))))
      val f: (Double, Double) => (Double, Double) =
        (familyScalar(crsTo), familyScalar(gm.crs)) match {
          case (Some((fwd, _)), _) if isGeographic(gm.crs) => fwd
          case (_, Some((_, inv))) if isGeographic(crsTo) => inv
          case (Some((fwd, _)), Some((_, inv))) =>
            // projected -> projected via the geographic pivot, matching
            // transformCols' column route
            (a: Double, b: Double) => { val (lo, la) = inv(a, b); fwd(lo, la) }
          case _ => throw new IllegalArgumentException(
            s"unsupported CRS pair ${gm.crs} -> $crsTo")
        }
      val corners = Seq(
        f(gm.xMin, gm.yMin), f(gm.xMin, gm.yMax),
        f(gm.xMax, gm.yMin), f(gm.xMax, gm.yMax))
      (corners.map(_._1).min, corners.map(_._2).min,
       corners.map(_._1).max, corners.map(_._2).max)
    }

  /** Mean linear scale of the supported transforms (for res estimates —
    * the route decision only; ~unity projection scale factors suffice
    * for the stereographic/LAEA families). */
  private def scaleFactor(crsFrom: String, crsTo: String): Double = {
    val degToMeters = ReprojectOps.EarthRadius * math.Pi / 180.0
    def metric(crs: String): Boolean =
      crs == "EPSG:3857" || UtmOps.zoneForCrs(crs).isDefined ||
        PolarOps.stereoForCrs(crs).isDefined ||
        PolarOps.laeaForCrs(crs).isDefined || PolarOps.isSinusoidal(crs) ||
        PolarOps.lccForCrs(crs).isDefined ||
        PolarOps.albersForCrs(crs).isDefined ||
        PolarOps.geosForCrs(crs).isDefined ||
        PolarOps.isEase2(crs) || PolarOps.orthoForCrs(crs).isDefined ||
        PolarOps.mollForCrs(crs).isDefined ||
        PolarOps.obliqueStereoForCrs(crs).isDefined ||
        PolarOps.eqEarthForCrs(crs).isDefined ||
        PolarOps.hotineForCrs(crs).isDefined ||
        PolarOps.mercForCrs(crs).isDefined ||
        PolarOps.eqcForCrs(crs).isDefined ||
        PolarOps.tmercForCrs(crs).isDefined
    // rotated-pole frames are DEGREES: unit linear scale either way
    if (PolarOps.rotPoleForCrs(crsFrom).isDefined ||
      PolarOps.rotPoleForCrs(crsTo).isDefined) 1.0
    else if (isGeographic(crsFrom) && crsTo == "EPSG:3857") degToMeters
    else if (crsFrom == "EPSG:3857" && isGeographic(crsTo)) 1.0 / degToMeters
    else if (isGeographic(crsFrom) && UtmOps.zoneForCrs(crsTo).isDefined)
      degToMeters * UtmOps.K0
    else if (UtmOps.zoneForCrs(crsFrom).isDefined && isGeographic(crsTo))
      1.0 / (degToMeters * UtmOps.K0)
    else if (isGeographic(crsFrom) && metric(crsTo)) degToMeters
    else if (metric(crsFrom) && isGeographic(crsTo)) 1.0 / degToMeters
    else 1.0
  }
}
