package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Polar-stereographic and Lambert-azimuthal-equal-area reprojection —
  * the two most common non-mercator satellite-product CRS families
  * (reference accepts ANY pyproj CRS, xcube/core/gridmapping/base.py:94,
  * resampling/reproject.py:27-500): NSIDC sea-ice grids EPSG:3413
  * (north, lat_ts 70°N, lon_0 −45°) / EPSG:3031 (south, lat_ts 71°S),
  * the European LAEA grid EPSG:3035 (oblique, lat_0 52°, lon_0 10°) and
  * the EASE-Grid 2.0 polar LAEA pair EPSG:6931/6932.
  *
  * Forward and inverse are the standard WGS84 closed forms (Snyder,
  * "Map Projections — A Working Manual", USGS PP 1395: polar
  * stereographic eqs. 21-33..21-41 + 15-9 with the conformal-latitude
  * inverse series 3-5; LAEA eqs. 24-17..24-19 + 25-16..25-18 with the
  * authalic-latitude series 3-18), the formulations proj uses.
  * Everything is plain column arithmetic + trig — codegen'd, no external
  * CRS library, and mirrorable in an SQL oracle because every constant
  * below is a shared Scala double (the [[UtmOps]] series discipline).
  */
object PolarOps {

  // WGS84 ellipsoid (same constants as UtmOps)
  val A: Double = 6378137.0
  val F: Double = 1.0 / 298.257223563
  val E2: Double = F * (2 - F)
  val E: Double = math.sqrt(E2)
  val E4: Double = E2 * E2
  val E6: Double = E4 * E2
  val E8: Double = E4 * E4

  // conformal-latitude inverse series (Snyder 3-5): φ = χ + C2 sin2χ + …
  val C2: Double = E2 / 2 + 5 * E4 / 24 + E6 / 12 + 13 * E8 / 360
  val C4: Double = 7 * E4 / 48 + 29 * E6 / 240 + 811 * E8 / 11520
  val C6: Double = 7 * E6 / 120 + 81 * E8 / 1120
  val C8: Double = 4279 * E8 / 161280

  // authalic-latitude inverse series (Snyder 3-18): φ = β + B2 sin2β + …
  val B2: Double = E2 / 3 + 31 * E4 / 180 + 517 * E6 / 5040
  val B4: Double = 23 * E4 / 360 + 251 * E6 / 3780
  val B6: Double = 761 * E6 / 45360

  /** q(90°) — the authalic pole constant (Snyder 3-12 at φ = π/2). */
  val Qp: Double =
    (1 - E2) * (1.0 / (1 - E2) - (1.0 / (2 * E)) * math.log((1 - E) / (1 + E)))

  // ------------------------------------------------------ CRS registries

  /** A polar stereographic CRS: hemisphere, standard parallel (lat_ts,
    * degrees, signed), central meridian, false easting/northing. A
    * non-NaN `k0` switches to the variant-A parameterization (scale
    * factor at the pole, EPSG method 9810 — the UPS family). */
  final case class PolarStereo(north: Boolean, latTs: Double, lon0: Double,
                               x0: Double, y0: Double,
                               k0: Double = Double.NaN) {
    /** tc, mc at the standard parallel (north-aspect magnitudes). */
    val tsAbs: Double = math.abs(latTs)
    val tc: Double = tFn(math.toRadians(tsAbs))
    val mc: Double = mFn(math.toRadians(tsAbs))
    /** ρ = RhoK · t(φn) with φn the north-aspect latitude. Variant B
      * (standard parallel, EPSG 9829): a·mc/tc. Variant A (scale factor
      * at the pole, 9810): 2·a·k0/√((1+e)^(1+e)·(1−e)^(1−e)) — EPSG
      * GN7-2 §1.3.6.1; the UPS worked example (73N 44E →
      * 3320416.75 / 632668.43) pins it in PolarOpsSpec. */
    val rhoK: Double =
      if (k0.isNaN) A * mc / tc
      else 2.0 * A * k0 / math.sqrt(
        math.pow(1 + E, 1 + E) * math.pow(1 - E, 1 - E))
  }

  def stereoForCrs(crs: String): Option[PolarStereo] = crs match {
    case "EPSG:3413" => Some(PolarStereo(north = true, 70.0, -45.0, 0.0, 0.0))
    case "EPSG:3976" => Some(PolarStereo(north = false, -70.0, 0.0, 0.0, 0.0))
    case "EPSG:3031" => Some(PolarStereo(north = false, -71.0, 0.0, 0.0, 0.0))
    // Universal Polar Stereographic (variant A, k0 = 0.994 at the pole)
    case "EPSG:5041" =>
      Some(PolarStereo(north = true, 90.0, 0.0, 2000000.0, 2000000.0,
        k0 = 0.994))
    case "EPSG:5042" =>
      Some(PolarStereo(north = false, -90.0, 0.0, 2000000.0, 2000000.0,
        k0 = 0.994))
    // generic WGS84 variant-A form `PSA:<+-90>:<k0>:<lon0>:<fe>:<fn>`
    case s if s.startsWith("PSA:") =>
      s.stripPrefix("PSA:").split(':').map(_.toDoubleOption) match {
        case Array(Some(l0), Some(k), Some(lo), Some(fe), Some(fn))
            if math.abs(l0) == 90.0 && k > 0 && k <= 1.0 =>
          Some(PolarStereo(l0 > 0, l0, lo, fe, fn, k0 = k))
        case _ => None
      }
    // generic WGS84 variant-B form `PS:<latTs>:<lon0>[:<fe>:<fn>]` —
    // hemisphere from the standard parallel's sign; |lat_ts| -> 90
    // degenerates (tc -> 0; that pole case is the variant-A k0
    // parameterization above)
    case s if s.startsWith("PS:") =>
      s.stripPrefix("PS:").split(':').map(_.toDoubleOption) match {
        case Array(Some(ts), Some(lo))
            if math.abs(ts) < 89.999 =>
          Some(PolarStereo(ts >= 0, ts, lo, 0.0, 0.0))
        case Array(Some(ts), Some(lo), Some(fe), Some(fn))
            if math.abs(ts) < 89.999 =>
          Some(PolarStereo(ts >= 0, ts, lo, fe, fn))
        case _ => None
      }
    case _ => None
  }

  /** A Lambert azimuthal equal-area CRS: center, false origin. Polar
    * aspects (|lat0| = 90) use the simpler polar equations. */
  final case class Laea(lat0: Double, lon0: Double, x0: Double, y0: Double) {
    val polarNorth: Boolean = lat0 >= 89.999999
    val polarSouth: Boolean = lat0 <= -89.999999
    val phi0: Double = math.toRadians(lat0)
    val beta1: Double = math.asin(qFn(phi0) / Qp)
    val rq: Double = A * math.sqrt(Qp / 2)
    val m1: Double = mFn(phi0)
    val d: Double = if (polarNorth || polarSouth) 1.0
      else A * m1 / (rq * math.cos(beta1))
  }

  def laeaForCrs(crs: String): Option[Laea] = crs match {
    case "EPSG:3035" => Some(Laea(52.0, 10.0, 4321000.0, 3210000.0))
    case "EPSG:6931" => Some(Laea(90.0, 0.0, 0.0, 0.0))
    case "EPSG:6932" => Some(Laea(-90.0, 0.0, 0.0, 0.0))
    // generic WGS84 form `LAEA:<lat0>:<lon0>[:<fe>:<fn>]` (the math is
    // already parameterized; polar aspects dispatch inside Laea)
    case s if s.startsWith("LAEA:") =>
      s.stripPrefix("LAEA:").split(':').map(_.toDoubleOption) match {
        case Array(Some(la), Some(lo)) if math.abs(la) <= 90 =>
          Some(Laea(la, lo, 0.0, 0.0))
        case Array(Some(la), Some(lo), Some(fe), Some(fn))
            if math.abs(la) <= 90 =>
          Some(Laea(la, lo, fe, fn))
        case _ => None
      }
    case _ => None
  }

  // ------------------------------------------------- MODIS sinusoidal

  /** The MODIS land grid's authalic sphere radius (meters) — the NASA
    * MODIS sinusoidal projection (SR-ORG:6974), public product spec. */
  val ModisSphereR: Double = 6371007.181

  /** Spherical sinusoidal (Snyder eq. 30-1/30-2): the MODIS land grid.
    * Equal-area, trivially invertible, central meridian 0. */
  def isSinusoidal(crs: String): Boolean =
    crs == "SR-ORG:6974" || crs == "MODIS:SIN"

  def sinuForward(lonDeg: Column, latDeg: Column): (Column, Column) = {
    val phi = radians(latDeg)
    (lit(ModisSphereR) * radians(lonDeg) * cos(phi),
      lit(ModisSphereR) * phi)
  }

  def sinuInverse(x: Column, y: Column): (Column, Column) = {
    val phi = y / lit(ModisSphereR)
    (degrees(x / (lit(ModisSphereR) * cos(phi))), degrees(phi))
  }

  def sinuForwardScalar(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    (ModisSphereR * math.toRadians(lonDeg) * math.cos(phi), ModisSphereR * phi)
  }

  def sinuInverseScalar(x: Double, y: Double): (Double, Double) = {
    val phi = y / ModisSphereR
    (math.toDegrees(x / (ModisSphereR * math.cos(phi))), math.toDegrees(phi))
  }

  // ------------------------------------ Lambert conformal conic (2SP)

  /** An LCC 2SP CRS (Snyder 15-1..15-11). Both registered instances
    * have n > 0 (northern standard parallels); the derived constants
    * are shared Scala doubles so SQL oracles mirror them bit-for-bit. */
  final case class Lcc(lat1: Double, lat2: Double, lat0: Double,
                       lon0: Double, x0: Double, y0: Double) {
    private val m1 = mFn(math.toRadians(lat1))
    private val m2 = mFn(math.toRadians(lat2))
    private val t1 = tFn(math.toRadians(lat1))
    private val t2 = tFn(math.toRadians(lat2))
    val n: Double = (math.log(m1) - math.log(m2)) /
      (math.log(t1) - math.log(t2))
    val f: Double = m1 / (n * math.pow(t1, n))
    val rho0: Double = A * f * math.pow(tFn(math.toRadians(lat0)), n)
    require(n > 0, s"southern-aspect LCC unsupported (n = $n)")
  }

  /** Registered LCC instances — EPSG:2154 (RGF93 / Lambert-93, the
    * French national grid) and EPSG:3978 (NAD83 / Canada Atlas
    * Lambert). Both datums use the GRS80 ellipsoid, whose flattening
    * differs from WGS84's in the 12th digit (~0.1 mm) — below every
    * tolerance here, so the shared WGS84 constants serve both. */
  def lccForCrs(crs: String): Option[Lcc] = crs match {
    case "EPSG:2154" => Some(Lcc(49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0))
    case "EPSG:3978" => Some(Lcc(49.0, 77.0, 49.0, -95.0, 0.0, 0.0))
    // generic WGS84/GRS80 2SP form
    // `LCC:<lat1>:<lat2>:<lat0>:<lon0>:<fe>:<fn>` (a southern-aspect
    // parallel pair still throws the case class's loud n > 0 require)
    case s if s.startsWith("LCC:") =>
      s.stripPrefix("LCC:").split(':').map(_.toDoubleOption) match {
        case Array(Some(l1), Some(l2), Some(l0), Some(lo), Some(fe),
            Some(fn)) if l1 != l2 =>
          Some(Lcc(l1, l2, l0, lo, fe, fn))
        case _ => None
      }
    case _ => None
  }

  def lccForward(lonDeg: Column, latDeg: Column, lc: Lcc)
      : (Column, Column) = {
    val rho = lit(A * lc.f) * pow(tExpr(radians(latDeg)), lit(lc.n))
    val th = lit(lc.n) * radians(lonDeg - lit(lc.lon0))
    (rho * sin(th) + lit(lc.x0),
      lit(lc.rho0) - rho * cos(th) + lit(lc.y0))
  }

  def lccInverse(easting: Column, northing: Column, lc: Lcc)
      : (Column, Column) = {
    val xr = easting - lit(lc.x0)
    val yr = lit(lc.rho0) - (northing - lit(lc.y0))
    val rho = sqrt(xr * xr + yr * yr)
    val t = pow(rho / lit(A * lc.f), lit(1.0 / lc.n))
    val lam = atan2(xr, yr) / lit(lc.n)
    (degrees(lam) + lit(lc.lon0), degrees(conformalPhi(t)))
  }

  def lccForwardScalar(lonDeg: Double, latDeg: Double, lc: Lcc)
      : (Double, Double) = {
    val rho = A * lc.f * math.pow(tFn(math.toRadians(latDeg)), lc.n)
    val th = lc.n * math.toRadians(lonDeg - lc.lon0)
    (rho * math.sin(th) + lc.x0, lc.rho0 - rho * math.cos(th) + lc.y0)
  }

  def lccInverseScalar(x: Double, y: Double, lc: Lcc): (Double, Double) = {
    val xr = x - lc.x0
    val yr = lc.rho0 - (y - lc.y0)
    val rho = math.hypot(xr, yr)
    val t = math.pow(rho / (A * lc.f), 1.0 / lc.n)
    (math.toDegrees(math.atan2(xr, yr) / lc.n) + lc.lon0,
      math.toDegrees(conformalPhiScalar(t)))
  }

  // ------------------------------------------ Albers equal-area conic

  /** An Albers 2SP CRS (Snyder 14-1..14-11, ellipsoidal via the
    * authalic q). */
  final case class Albers(lat1: Double, lat2: Double, lat0: Double,
                          lon0: Double, x0: Double, y0: Double) {
    private val m1 = mFn(math.toRadians(lat1))
    private val m2 = mFn(math.toRadians(lat2))
    private val q1 = qFn(math.toRadians(lat1))
    private val q2 = qFn(math.toRadians(lat2))
    val n: Double = (m1 * m1 - m2 * m2) / (q2 - q1)
    val c: Double = m1 * m1 + n * q1
    val rho0: Double = A * math.sqrt(c - n * qFn(math.toRadians(lat0))) / n
    require(n > 0, s"southern-aspect Albers unsupported (n = $n)")
  }

  /** EPSG:5070 — NAD83 / Conus Albers, the US national equal-area grid
    * (NLCD and friends). GRS80 ≈ WGS84 as above. */
  def albersForCrs(crs: String): Option[Albers] = crs match {
    case "EPSG:5070" => Some(Albers(29.5, 45.5, 23.0, -96.0, 0.0, 0.0))
    // generic WGS84/GRS80 2SP form
    // `ALBERS:<lat1>:<lat2>:<lat0>:<lon0>:<fe>:<fn>`
    case s if s.startsWith("ALBERS:") =>
      s.stripPrefix("ALBERS:").split(':').map(_.toDoubleOption) match {
        case Array(Some(l1), Some(l2), Some(l0), Some(lo), Some(fe),
            Some(fn)) if l1 != l2 =>
          Some(Albers(l1, l2, l0, lo, fe, fn))
        case _ => None
      }
    case _ => None
  }

  def albersForward(lonDeg: Column, latDeg: Column, ab: Albers)
      : (Column, Column) = {
    val q = qExpr(sin(radians(latDeg)))
    val rho = lit(A) * sqrt(lit(ab.c) - lit(ab.n) * q) / lit(ab.n)
    val th = lit(ab.n) * radians(lonDeg - lit(ab.lon0))
    (rho * sin(th) + lit(ab.x0),
      lit(ab.rho0) - rho * cos(th) + lit(ab.y0))
  }

  def albersInverse(easting: Column, northing: Column, ab: Albers)
      : (Column, Column) = {
    val xr = easting - lit(ab.x0)
    val yr = lit(ab.rho0) - (northing - lit(ab.y0))
    val rho = sqrt(xr * xr + yr * yr)
    val q = (lit(ab.c) - (rho * lit(ab.n) / lit(A)) * (rho * lit(ab.n) / lit(A))) / lit(ab.n)
    val beta = asin(q / lit(Qp))
    (degrees(atan2(xr, yr) / lit(ab.n)) + lit(ab.lon0),
      degrees(authalicPhi(beta, q)))
  }

  def albersForwardScalar(lonDeg: Double, latDeg: Double, ab: Albers)
      : (Double, Double) = {
    val q = qFn(math.toRadians(latDeg))
    val rho = A * math.sqrt(ab.c - ab.n * q) / ab.n
    val th = ab.n * math.toRadians(lonDeg - ab.lon0)
    (rho * math.sin(th) + ab.x0, ab.rho0 - rho * math.cos(th) + ab.y0)
  }

  def albersInverseScalar(x: Double, y: Double, ab: Albers)
      : (Double, Double) = {
    val xr = x - ab.x0
    val yr = ab.rho0 - (y - ab.y0)
    val rho = math.hypot(xr, yr)
    val q = (ab.c - math.pow(rho * ab.n / A, 2)) / ab.n
    val beta = math.asin(q / Qp)
    (math.toDegrees(math.atan2(xr, yr) / ab.n) + ab.lon0,
      math.toDegrees(authalicPhiScalar(beta, q)))
  }

  // --------------------------------------------------- rotated pole

  /** A rotated-pole geographic CRS — the COSMO/HIRLAM regional-weather
    * grid family: coordinates are lon/lat DEGREES in a frame whose
    * north pole sits at (`poleLatDeg`, `poleLonDeg`) in TRUE geographic
    * coordinates (the GRIB southern-pole convention negated). Spherical
    * by construction (the rotation is exact; these grids are defined on
    * a sphere). Named "ROTPOLE:<poleLat>:<poleLon>" to stay free of the
    * proj ob_tran parameter-convention ambiguity. */
  final case class RotPole(poleLatDeg: Double, poleLonDeg: Double) {
    // v' = Rz(π) · Ry(φp − π/2) · Rz(−λp) · v maps the pole to +z with
    // the COSMO zero-meridian convention: the true meridian λp ± 180°
    // (the grid center's meridian) reads as rotated lon 0
    val sinT: Double = math.sin(math.toRadians(poleLatDeg) - math.Pi / 2)
    val cosT: Double = math.cos(math.toRadians(poleLatDeg) - math.Pi / 2)
  }

  def rotPoleForCrs(crs: String): Option[RotPole] =
    if (!crs.startsWith("ROTPOLE:")) None
    else crs.stripPrefix("ROTPOLE:").split(':') match {
      case Array(a, b) =>
        for (la <- a.toDoubleOption; lo <- b.toDoubleOption
             if la > -90 && la <= 90)
          yield RotPole(la, lo)
      case _ => None
    }

  /** TRUE (lonDeg, latDeg) → ROTATED (lon', lat') in degrees. */
  def rotPoleForward(lonDeg: Column, latDeg: Column, rp: RotPole)
      : (Column, Column) = {
    val phi = radians(latDeg)
    val lam = radians(lonDeg - lit(rp.poleLonDeg)) // Rz(−λp) folded in
    // v1 = Rz-rotated unit vector; v' = Ry(θ)·v1 with θ = φp − π/2
    val x1 = cos(phi) * cos(lam)
    val y1 = cos(phi) * sin(lam)
    val z1 = sin(phi)
    val x2 = x1 * lit(rp.cosT) + z1 * lit(rp.sinT)
    val z2 = negate(x1 * lit(rp.sinT)) + z1 * lit(rp.cosT)
    (degrees(atan2(negate(y1), negate(x2))), degrees(asin(z2)))
  }

  /** ROTATED (lon', lat') → TRUE (lonDeg, latDeg): the transposed
    * rotations. */
  def rotPoleInverse(lonDeg: Column, latDeg: Column, rp: RotPole)
      : (Column, Column) = {
    val phi = radians(latDeg)
    val lam = radians(lonDeg)
    // undo Rz(π) first: (x, y) → (−x, −y)
    val x1 = negate(cos(phi) * cos(lam))
    val y1 = negate(cos(phi) * sin(lam))
    val z1 = sin(phi)
    val x2 = x1 * lit(rp.cosT) - z1 * lit(rp.sinT)
    val z2 = x1 * lit(rp.sinT) + z1 * lit(rp.cosT)
    val lonT = degrees(atan2(y1, x2)) + lit(rp.poleLonDeg)
    // normalize to (−180, 180] (atan2 + pole lon can leave the range)
    (lonT - lit(360.0) * ceil((lonT - lit(180.0)) / lit(360.0)),
      degrees(asin(z2)))
  }

  def rotPoleForwardScalar(lonDeg: Double, latDeg: Double, rp: RotPole)
      : (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - rp.poleLonDeg)
    val x1 = math.cos(phi) * math.cos(lam)
    val y1 = math.cos(phi) * math.sin(lam)
    val z1 = math.sin(phi)
    val x2 = x1 * rp.cosT + z1 * rp.sinT
    val z2 = -x1 * rp.sinT + z1 * rp.cosT
    (math.toDegrees(math.atan2(-y1, -x2)), math.toDegrees(math.asin(z2)))
  }

  def rotPoleInverseScalar(lonDeg: Double, latDeg: Double, rp: RotPole)
      : (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val x1 = -math.cos(phi) * math.cos(lam) // undo Rz(π)
    val y1 = -math.cos(phi) * math.sin(lam)
    val z1 = math.sin(phi)
    val x2 = x1 * rp.cosT - z1 * rp.sinT
    val z2 = x1 * rp.sinT + z1 * rp.cosT
    val lonT = math.toDegrees(math.atan2(y1, x2)) + rp.poleLonDeg
    (lonT - 360.0 * math.ceil((lonT - 180.0) / 360.0),
      math.toDegrees(math.asin(z2)))
  }

  // --------------------------------------------------- scalar primitives

  /** Snyder 15-9: t(φ) = tan(π/4 − φ/2) · [(1+e sinφ)/(1−e sinφ)]^(e/2). */
  private def tFn(phi: Double): Double = {
    val es = E * math.sin(phi)
    math.tan(math.Pi / 4 - phi / 2) *
      math.pow((1 + es) / (1 - es), E / 2)
  }

  /** Column twin of [[tFn]] (same IEEE op order). */
  private def tExpr(phi: Column): Column = {
    val es = lit(E) * sin(phi)
    tan(lit(math.Pi / 4) - phi / 2) *
      pow((lit(1.0) + es) / (lit(1.0) - es), lit(E / 2))
  }

  /** Column twin of [[qFn]] over s = sinφ. */
  private def qExpr(s: Column): Column =
    lit(1 - E2) * (s / (lit(1.0) - lit(E2) * s * s) -
      lit(1.0 / (2 * E)) *
        log((lit(1.0) - lit(E) * s) / (lit(1.0) + lit(E) * s)))

  /** The conformal-latitude inverse: series seed (Snyder 3-5) plus one
    * pass of the exact fixed-point iteration (Snyder 7-9) — closes
    * forward∘inverse to ≲1e-12°. */
  private def conformalPhi(t: Column): Column = {
    val chi = lit(math.Pi / 2) - lit(2.0) * atan(t)
    val phi0 = chi + lit(C2) * sin(lit(2.0) * chi) +
      lit(C4) * sin(lit(4.0) * chi) + lit(C6) * sin(lit(6.0) * chi) +
      lit(C8) * sin(lit(8.0) * chi)
    val es = lit(E) * sin(phi0)
    lit(math.Pi / 2) - lit(2.0) *
      atan(t * pow((lit(1.0) - es) / (lit(1.0) + es), lit(E / 2)))
  }

  private def conformalPhiScalar(t: Double): Double = {
    val chi = math.Pi / 2 - 2 * math.atan(t)
    val phi0 = chi + C2 * math.sin(2 * chi) + C4 * math.sin(4 * chi) +
      C6 * math.sin(6 * chi) + C8 * math.sin(8 * chi)
    val es = E * math.sin(phi0)
    math.Pi / 2 - 2 * math.atan(t * math.pow((1 - es) / (1 + es), E / 2))
  }

  /** Snyder 14-15: m(φ) = cosφ / sqrt(1 − e² sin²φ). */
  private def mFn(phi: Double): Double = {
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - E2 * s * s)
  }

  /** Snyder 3-12: the authalic q. */
  private def qFn(phi: Double): Double = {
    val s = math.sin(phi)
    (1 - E2) * (s / (1 - E2 * s * s) -
      (1.0 / (2 * E)) * math.log((1 - E * s) / (1 + E * s)))
  }

  // ------------------------------------- polar stereographic, column form

  /** Forward: (lonDeg, latDeg) → (easting, northing). South aspect runs
    * the north equations on the mirrored (−φ, −(λ−λ0)) and negates both
    * outputs (Snyder p. 161 sign-reversal rule). */
  def stereoForward(lonDeg: Column, latDeg: Column, ps: PolarStereo)
      : (Column, Column) = {
    val sgn = if (ps.north) 1.0 else -1.0
    val phi = radians(latDeg * sgn)
    val lam = radians((lonDeg - lit(ps.lon0)) * sgn)
    val es = lit(E) * sin(phi)
    val t = tan(lit(math.Pi / 4) - phi / 2) *
      pow((lit(1.0) + es) / (lit(1.0) - es), lit(E / 2))
    val rho = lit(ps.rhoK) * t
    val x = rho * sin(lam) * sgn + lit(ps.x0)
    val y = negate(rho * cos(lam)) * sgn + lit(ps.y0)
    (x, y)
  }

  /** Inverse: (easting, northing) → (lonDeg, latDeg) via the conformal
    * latitude series (Snyder 21-39/40 + 3-5), tightened by one pass of
    * the exact fixed-point iteration (Snyder 7-9) so forward∘inverse
    * closes to ≲1e-12° — the series seed alone truncates at ~e¹⁰. */
  def stereoInverse(easting: Column, northing: Column, ps: PolarStereo)
      : (Column, Column) = {
    val sgn = if (ps.north) 1.0 else -1.0
    val xn = (easting - lit(ps.x0)) * sgn
    val yn = (northing - lit(ps.y0)) * sgn
    val rho = sqrt(xn * xn + yn * yn)
    val phi = conformalPhi(rho / lit(ps.rhoK))
    val lam = atan2(xn, negate(yn))
    (degrees(lam) * sgn + lit(ps.lon0), degrees(phi) * sgn)
  }

  def stereoForwardScalar(lonDeg: Double, latDeg: Double, ps: PolarStereo)
      : (Double, Double) = {
    val sgn = if (ps.north) 1.0 else -1.0
    val phi = math.toRadians(latDeg * sgn)
    val lam = math.toRadians((lonDeg - ps.lon0) * sgn)
    val rho = ps.rhoK * tFn(phi)
    (rho * math.sin(lam) * sgn + ps.x0, -rho * math.cos(lam) * sgn + ps.y0)
  }

  def stereoInverseScalar(x: Double, y: Double, ps: PolarStereo)
      : (Double, Double) = {
    val sgn = if (ps.north) 1.0 else -1.0
    val xn = (x - ps.x0) * sgn
    val yn = (y - ps.y0) * sgn
    val rho = math.hypot(xn, yn)
    val phi = conformalPhiScalar(rho / ps.rhoK)
    (math.toDegrees(math.atan2(xn, -yn)) * sgn + ps.lon0,
      math.toDegrees(phi) * sgn)
  }

  // ------------------------------------------------- LAEA, column form

  /** Forward LAEA. Polar aspects use Snyder 24-23/24 (ρ = a·sqrt(qp ∓ q));
    * the oblique aspect uses 24-17..24-19 with the D stretch. */
  def laeaForward(lonDeg: Column, latDeg: Column, la: Laea)
      : (Column, Column) = {
    val phi = radians(latDeg)
    val q = qExpr(sin(phi))
    val lam = radians(lonDeg - lit(la.lon0))
    if (la.polarNorth || la.polarSouth) {
      val sgn = if (la.polarNorth) 1.0 else -1.0
      val rho = lit(A) * sqrt(lit(Qp) - q * sgn)
      (rho * sin(lam) + lit(la.x0),
        negate(rho * cos(lam)) * sgn + lit(la.y0))
    } else {
      val beta = asin(q / lit(Qp))
      val b = lit(la.rq) * sqrt(lit(2.0) /
        (lit(1.0) + lit(math.sin(la.beta1)) * sin(beta) +
          lit(math.cos(la.beta1)) * cos(beta) * cos(lam)))
      val x = b * lit(la.d) * cos(beta) * sin(lam) + lit(la.x0)
      val y = (b / lit(la.d)) * (lit(math.cos(la.beta1)) * sin(beta) -
        lit(math.sin(la.beta1)) * cos(beta) * cos(lam)) + lit(la.y0)
      (x, y)
    }
  }

  /** The authalic-latitude inverse: series seed (Snyder 3-18) plus one
    * Newton step (Snyder 3-16) — the e⁶-truncated series alone leaves
    * ~6e-10 rad, above a 1e-9° round-trip budget. Pole-guarded (the
    * series is exact at β = ±π/2, where Newton's 1/cosφ blows up). */
  private def authalicPhi(beta: Column, q: Column): Column = {
    val phi0 = beta + lit(B2) * sin(lit(2.0) * beta) +
      lit(B4) * sin(lit(4.0) * beta) + lit(B6) * sin(lit(6.0) * beta)
    val s = sin(phi0)
    val om = lit(1.0) - lit(E2) * s * s
    val corr = om * om / (lit(2.0) * cos(phi0)) *
      (q / lit(1 - E2) - s / om + lit(1.0 / (2 * E)) *
        log((lit(1.0) - lit(E) * s) / (lit(1.0) + lit(E) * s)))
    when(abs(cos(phi0)) > 1e-8, phi0 + corr).otherwise(phi0)
  }

  private def authalicPhiScalar(beta: Double, q: Double): Double = {
    val phi0 = beta + B2 * math.sin(2 * beta) + B4 * math.sin(4 * beta) +
      B6 * math.sin(6 * beta)
    val c = math.cos(phi0)
    if (math.abs(c) <= 1e-8) return phi0
    val s = math.sin(phi0)
    val om = 1 - E2 * s * s
    phi0 + om * om / (2 * c) * (q / (1 - E2) - s / om +
      1.0 / (2 * E) * math.log((1 - E * s) / (1 + E * s)))
  }

  /** Inverse LAEA via the authalic latitude (Snyder 25-16..25-18 +
    * [[authalicPhi]]). The exact center point (ρ = 0) returns
    * (lon0, lat0). */
  def laeaInverse(easting: Column, northing: Column, la: Laea)
      : (Column, Column) = {
    val xr = easting - lit(la.x0)
    val yr = northing - lit(la.y0)
    if (la.polarNorth || la.polarSouth) {
      val sgn = if (la.polarNorth) 1.0 else -1.0
      val rho = sqrt(xr * xr + yr * yr)
      val q = (lit(Qp) - (rho / lit(A)) * (rho / lit(A))) * sgn
      val beta = asin(q / lit(Qp))
      val phi = authalicPhi(beta, q)
      val lam = atan2(xr, negate(yr) * sgn)
      (when(rho === 0.0, lit(la.lon0)).otherwise(degrees(lam) + lit(la.lon0)),
        when(rho === 0.0, lit(la.lat0)).otherwise(degrees(phi)))
    } else {
      val xd = xr / lit(la.d)
      val yd = yr * lit(la.d)
      val rho = sqrt(xd * xd + yd * yd)
      val ce = lit(2.0) * asin(rho / lit(2 * la.rq))
      val beta = asin(cos(ce) * lit(math.sin(la.beta1)) +
        yd * sin(ce) * lit(math.cos(la.beta1)) / rho)
      val phi = authalicPhi(beta, lit(Qp) * sin(beta))
      val lam = atan2(xd * sin(ce),
        rho * lit(math.cos(la.beta1)) * cos(ce) -
          yd * lit(math.sin(la.beta1)) * sin(ce))
      (when(rho === 0.0, lit(la.lon0)).otherwise(degrees(lam) + lit(la.lon0)),
        when(rho === 0.0, lit(la.lat0)).otherwise(degrees(phi)))
    }
  }

  def laeaForwardScalar(lonDeg: Double, latDeg: Double, la: Laea)
      : (Double, Double) = {
    val q = qFn(math.toRadians(latDeg))
    val lam = math.toRadians(lonDeg - la.lon0)
    if (la.polarNorth || la.polarSouth) {
      val sgn = if (la.polarNorth) 1.0 else -1.0
      val rho = A * math.sqrt(Qp - q * sgn)
      (rho * math.sin(lam) + la.x0, -rho * math.cos(lam) * sgn + la.y0)
    } else {
      val beta = math.asin(q / Qp)
      val b = la.rq * math.sqrt(2.0 /
        (1 + math.sin(la.beta1) * math.sin(beta) +
          math.cos(la.beta1) * math.cos(beta) * math.cos(lam)))
      (b * la.d * math.cos(beta) * math.sin(lam) + la.x0,
        (b / la.d) * (math.cos(la.beta1) * math.sin(beta) -
          math.sin(la.beta1) * math.cos(beta) * math.cos(lam)) + la.y0)
    }
  }

  def laeaInverseScalar(x: Double, y: Double, la: Laea): (Double, Double) = {
    val xr = x - la.x0
    val yr = y - la.y0
    if (la.polarNorth || la.polarSouth) {
      val sgn = if (la.polarNorth) 1.0 else -1.0
      val rho = math.hypot(xr, yr)
      if (rho == 0.0) return (la.lon0, la.lat0)
      val q = (Qp - (rho / A) * (rho / A)) * sgn
      val beta = math.asin(q / Qp)
      val phi = authalicPhiScalar(beta, q)
      (math.toDegrees(math.atan2(xr, -yr * sgn)) + la.lon0,
        math.toDegrees(phi))
    } else {
      val xd = xr / la.d
      val yd = yr * la.d
      val rho = math.hypot(xd, yd)
      if (rho == 0.0) return (la.lon0, la.lat0)
      val ce = 2 * math.asin(rho / (2 * la.rq))
      val beta = math.asin(math.cos(ce) * math.sin(la.beta1) +
        yd * math.sin(ce) * math.cos(la.beta1) / rho)
      val phi = authalicPhiScalar(beta, Qp * math.sin(beta))
      val lam = math.atan2(xd * math.sin(ce),
        rho * math.cos(la.beta1) * math.cos(ce) -
          yd * math.sin(la.beta1) * math.sin(ce))
      (math.toDegrees(lam) + la.lon0, math.toDegrees(phi))
    }
  }

  // ------------------------------------ EASE-Grid 2.0 (EPSG:6933)

  /** EASE-Grid 2.0 global (EPSG:6933) — the SMAP/SMOS/AMSR soil-moisture
    * grid family: normal cylindrical equal-area on WGS84 with standard
    * parallels ±30° (Snyder eq. 10-1/10-2 ellipsoidal form; the inverse
    * rides the same authalic-latitude series as LAEA). Derived scale
    * sanity: A·π·k0 = 17 367 530.45 m, the grid's published global
    * half-width. */
  val Ease2LatTs: Double = 30.0
  /** k0 = cos φs / sqrt(1 − e² sin² φs) at the ±30° standard parallels. */
  val Ease2K0: Double = {
    val phi = math.toRadians(Ease2LatTs)
    val s = math.sin(phi)
    math.cos(phi) / math.sqrt(1 - E2 * s * s)
  }

  def isEase2(crs: String): Boolean = crs == "EPSG:6933"

  def ease2Forward(lonDeg: Column, latDeg: Column): (Column, Column) = {
    val q = qExpr(sin(radians(latDeg)))
    (lit(A * Ease2K0) * radians(lonDeg),
      lit(A / (2.0 * Ease2K0)) * q)
  }

  def ease2Inverse(x: Column, y: Column): (Column, Column) = {
    val q = y * lit(2.0 * Ease2K0 / A)
    val beta = asin(q / lit(Qp)) // |q| > Qp (off-grid) → NaN
    (degrees(x / lit(A * Ease2K0)), degrees(authalicPhi(beta, q)))
  }

  def ease2ForwardScalar(lonDeg: Double, latDeg: Double): (Double, Double) =
    (A * Ease2K0 * math.toRadians(lonDeg),
      A / (2.0 * Ease2K0) * qFn(math.toRadians(latDeg)))

  def ease2InverseScalar(x: Double, y: Double): (Double, Double) = {
    val q = y * (2.0 * Ease2K0 / A)
    val r = q / Qp
    if (math.abs(r) > 1.0) return (Double.NaN, Double.NaN)
    val beta = math.asin(r)
    (math.toDegrees(x / (A * Ease2K0)),
      math.toDegrees(authalicPhiScalar(beta, q)))
  }

  // -------------------------------------------------- orthographic

  /** Spherical orthographic (Snyder eq. 20-3..20-17) — the satellite-
    * view projection, parameterized by its tangent point:
    * "ORTHO:<lat0>:<lon0>". Spherical by convention like the sinusoidal
    * and rotated-pole families (the MODIS authalic sphere radius);
    * points beyond the visible hemisphere read NaN. */
  final case class Ortho(lat0Deg: Double, lon0Deg: Double) {
    val sin0: Double = math.sin(math.toRadians(lat0Deg))
    val cos0: Double = math.cos(math.toRadians(lat0Deg))
  }

  def orthoForCrs(crs: String): Option[Ortho] =
    if (!crs.startsWith("ORTHO:")) None
    else crs.stripPrefix("ORTHO:").split(':') match {
      case Array(a, b) =>
        for (la <- a.toDoubleOption; lo <- b.toDoubleOption
             if la >= -90 && la <= 90)
          yield Ortho(la, lo)
      case _ => None
    }

  def orthoForward(lonDeg: Column, latDeg: Column, o: Ortho)
      : (Column, Column) = {
    val phi = radians(latDeg)
    val dl = radians(lonDeg - lit(o.lon0Deg))
    // hemisphere test: cos(c) = sinφ0 sinφ + cosφ0 cosφ cosΔλ ≥ 0
    val cosc = lit(o.sin0) * sin(phi) + lit(o.cos0) * cos(phi) * cos(dl)
    val vis = when(cosc >= 0.0, lit(1.0)).otherwise(lit(Double.NaN))
    (vis * lit(ModisSphereR) * cos(phi) * sin(dl),
      vis * lit(ModisSphereR) *
        (lit(o.cos0) * sin(phi) - lit(o.sin0) * cos(phi) * cos(dl)))
  }

  def orthoInverse(x: Column, y: Column, o: Ortho): (Column, Column) = {
    val rho = sqrt(x * x + y * y)
    val c = asin(rho / lit(ModisSphereR)) // ρ > R (off-disk) → NaN
    // ρ = 0 (the tangent point) makes y·sin(c)/ρ a 0/0 — guard to center
    val phi = when(rho === 0.0, lit(math.toRadians(o.lat0Deg)))
      .otherwise(asin(cos(c) * lit(o.sin0) +
        y * sin(c) * lit(o.cos0) / rho))
    val lam = when(rho === 0.0, lit(0.0))
      .otherwise(atan2(x * sin(c),
        rho * lit(o.cos0) * cos(c) - y * lit(o.sin0) * sin(c)))
    (degrees(lam) + lit(o.lon0Deg), degrees(phi))
  }

  def orthoForwardScalar(lonDeg: Double, latDeg: Double, o: Ortho)
      : (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val dl = math.toRadians(lonDeg - o.lon0Deg)
    val cosc = o.sin0 * math.sin(phi) + o.cos0 * math.cos(phi) * math.cos(dl)
    if (cosc < 0.0) return (Double.NaN, Double.NaN)
    (ModisSphereR * math.cos(phi) * math.sin(dl),
      ModisSphereR *
        (o.cos0 * math.sin(phi) - o.sin0 * math.cos(phi) * math.cos(dl)))
  }

  def orthoInverseScalar(x: Double, y: Double, o: Ortho): (Double, Double) = {
    val rho = math.sqrt(x * x + y * y)
    if (rho > ModisSphereR) return (Double.NaN, Double.NaN)
    if (rho == 0.0) return (o.lon0Deg, o.lat0Deg)
    val c = math.asin(rho / ModisSphereR)
    val phi = math.asin(math.cos(c) * o.sin0 +
      y * math.sin(c) * o.cos0 / rho)
    val lam = math.atan2(x * math.sin(c),
      rho * o.cos0 * math.cos(c) - y * o.sin0 * math.sin(c))
    (math.toDegrees(lam) + o.lon0Deg, math.toDegrees(phi))
  }

  // ---------------------------------------------------- Mollweide

  /** Spherical Mollweide (Snyder eq. 31-1..31-8) — the classic equal-
    * area world-map projection ("MOLL:<lon0>"), on the same authalic
    * sphere as the sinusoidal/orthographic families. The auxiliary
    * angle satisfies 2θ + sin 2θ = π sin φ; both the Column and the
    * scalar (and the SQL oracle twin) run the SAME fixed-count
    * pole-guarded Newton iteration, so results are bit-identical across
    * forms — a converged-loop would be engine-order-dependent. */
  final case class Mollweide(lon0Deg: Double)

  val MollSqrt2: Double = math.sqrt(2.0)
  val MollXScale: Double = 2.0 * math.sqrt(2.0) / math.Pi

  def mollForCrs(crs: String): Option[Mollweide] =
    if (!crs.startsWith("MOLL:")) None
    else crs.stripPrefix("MOLL:").toDoubleOption.map(Mollweide(_))

  def mollForward(lonDeg: Column, latDeg: Column, m: Mollweide)
      : (Column, Column) = {
    // the iteration lives in a native Expression: an unrolled Column
    // `when` chain re-substitutes θ four times per step — an O(4^steps)
    // tree that OOMed the driver at 8 steps
    import org.apache.spark.sql.graft.ColumnBridge
    val theta = ColumnBridge.column(graft.functions.MollTheta(
      ColumnBridge.expression(radians(latDeg))))
    (lit(ModisSphereR * MollXScale) * radians(lonDeg - lit(m.lon0Deg)) *
      cos(theta),
      lit(ModisSphereR * MollSqrt2) * sin(theta))
  }

  def mollInverse(x: Column, y: Column, m: Mollweide): (Column, Column) = {
    val theta = asin(y / lit(ModisSphereR * MollSqrt2)) // off-map → NaN
    val phi = asin((lit(2.0) * theta + sin(lit(2.0) * theta)) /
      lit(math.Pi))
    val lam = when(abs(cos(theta)) > 1e-14,
      x / (lit(ModisSphereR * MollXScale) * cos(theta)))
      .otherwise(lit(0.0)) // the poles collapse to the central meridian
    (degrees(lam) + lit(m.lon0Deg), degrees(phi))
  }

  def mollForwardScalar(lonDeg: Double, latDeg: Double, m: Mollweide)
      : (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val target = math.Pi * math.sin(phi)
    var theta = phi
    var k = 0
    while (k < graft.functions.MollTheta.Steps) {
      val dn = 2.0 + 2.0 * math.cos(2.0 * theta)
      if (dn > 1e-14)
        theta = theta -
          (2.0 * theta + math.sin(2.0 * theta) - target) / dn
      k += 1
    }
    (ModisSphereR * MollXScale * math.toRadians(lonDeg - m.lon0Deg) *
      math.cos(theta),
      ModisSphereR * MollSqrt2 * math.sin(theta))
  }

  def mollInverseScalar(x: Double, y: Double, m: Mollweide)
      : (Double, Double) = {
    val sy = y / (ModisSphereR * MollSqrt2)
    if (math.abs(sy) > 1.0) return (Double.NaN, Double.NaN)
    val theta = math.asin(sy)
    val phi = math.asin((2.0 * theta + math.sin(2.0 * theta)) / math.Pi)
    val lam =
      if (math.abs(math.cos(theta)) > 1e-14)
        x / (ModisSphereR * MollXScale * math.cos(theta))
      else 0.0
    (math.toDegrees(lam) + m.lon0Deg, math.toDegrees(phi))
  }

  // --------------------------------------------------- geostationary

  /** The geostationary perspective projection ("geos") — the MSG/GOES
    * full-disk product family, the largest real-world CRS family the
    * reference reaches through pyproj that had no closed form here
    * (reference resampling/spatial.py:28-261 accepts any CRS; CF
    * grid_mapping_name "geostationary"). GRS80 ellipsoid; projection
    * coordinates are scan angles × perspective height (metres), the
    * PROJ +proj=geos convention. `sweepX` = the GOES-R scan geometry
    * (sweep_angle_axis "x"); MSG/SEVIRI uses sweep "y". Named
    * "GEOS:<lon0>" (standard 35,786,023 m height, sweep x) or fully
    * "GEOS:<lon0>:<h>:<x|y>". Forward/inverse verified against the
    * published GOES-R Product Definition and Users' Guide worked
    * example (lon −84.690932, lat 33.846162 ↔ scan angles −0.024052,
    * 0.095340 rad at lon0 −75, sweep x). */
  final case class Geos(lon0Deg: Double, h: Double, sweepX: Boolean) {
    val rEq: Double = 6378137.0
    val rPol: Double = 6356752.31414
    val bigH: Double = h + rEq
    val e2: Double = (rEq * rEq - rPol * rPol) / (rEq * rEq)
    val invFlat2: Double = (rEq * rEq) / (rPol * rPol)
  }

  def geosForCrs(crs: String): Option[Geos] =
    if (!crs.startsWith("GEOS:")) None
    else crs.stripPrefix("GEOS:").split(':') match {
      case Array(l) =>
        l.toDoubleOption.map(Geos(_, 35786023.0, sweepX = true))
      case Array(l, hh, sw) if sw == "x" || sw == "y" =>
        for (lo <- l.toDoubleOption; hv <- hh.toDoubleOption if hv > 0)
          yield Geos(lo, hv, sweepX = sw == "x")
      case _ => None
    }

  /** (lonDeg, latDeg) → geostationary (x, y) metres. Points not visible
    * from the satellite (behind the limb) read NaN — the quadratic the
    * inverse solves has no real root there, and the forward's own
    * geometry produces angles only for the near hemisphere, which the
    * ±90° dlon guard enforces. */
  def geosForward(lonDeg: Column, latDeg: Column, g: Geos)
      : (Column, Column) = {
    val latc = atan(lit(1.0 / g.invFlat2) * tan(radians(latDeg)))
    val rc = lit(g.rPol) / sqrt(lit(1.0) - lit(g.e2) * cos(latc) * cos(latc))
    val dlon = radians(lonDeg - lit(g.lon0Deg))
    val sx0 = lit(g.bigH) - rc * cos(latc) * cos(dlon)
    val sy0 = negate(rc * cos(latc) * sin(dlon))
    val sz0 = rc * sin(latc)
    // limb visibility: the satellite sees the point iff the view ray is
    // outside the local horizon — the PUG test sx·(sx − H) + sy² + sz²·
    // (rEq/rPol)² < 0 (violations → NaN, the masked-cell convention)
    val vis = sx0 * (sx0 - lit(g.bigH)) + sy0 * sy0 +
      lit(g.invFlat2) * sz0 * sz0 < lit(0.0)
    val nan = lit(Double.NaN)
    val sx = when(vis, sx0).otherwise(nan)
    val sy = sy0
    val sz = sz0
    val r = sqrt(sx * sx + sy * sy + sz * sz)
    if (g.sweepX)
      (lit(g.h) * asin(negate(sy) / r), lit(g.h) * atan(sz / sx))
    else
      (lit(g.h) * atan(negate(sy) / sx), lit(g.h) * asin(sz / r))
  }

  /** geostationary (x, y) metres → (lonDeg, latDeg); off-disk points
    * (no ellipsoid intersection) read NaN via the negative discriminant. */
  def geosInverse(x: Column, y: Column, g: Geos): (Column, Column) = {
    val xa = x / lit(g.h)
    val ya = y / lit(g.h)
    // unit view ray u from the satellite, by sweep geometry
    val (u1, u2, u3) =
      if (g.sweepX)
        (cos(xa) * cos(ya), negate(sin(xa)), cos(xa) * sin(ya))
      else
        (cos(ya) * cos(xa), negate(cos(ya) * sin(xa)), sin(ya))
    val aq = u1 * u1 + u2 * u2 + lit(g.invFlat2) * u3 * u3
    val bq = lit(-2.0 * g.bigH) * u1
    val cq = lit(g.bigH * g.bigH - g.rEq * g.rEq)
    val rs = (negate(bq) - sqrt(bq * bq - lit(4.0) * aq * cq)) /
      (lit(2.0) * aq)
    val sx = rs * u1
    val sy = rs * u2
    val sz = rs * u3
    val lat = atan(lit(g.invFlat2) * sz /
      sqrt((lit(g.bigH) - sx) * (lit(g.bigH) - sx) + sy * sy))
    val lon = lit(g.lon0Deg) - degrees(atan(sy / (lit(g.bigH) - sx)))
    (lon, degrees(lat))
  }

  def geosForwardScalar(lonDeg: Double, latDeg: Double, g: Geos)
      : (Double, Double) = {
    val latc = math.atan((1.0 / g.invFlat2) * math.tan(math.toRadians(latDeg)))
    val rc = g.rPol / math.sqrt(1.0 - g.e2 * math.cos(latc) * math.cos(latc))
    val dlon = math.toRadians(lonDeg - g.lon0Deg)
    val sx = g.bigH - rc * math.cos(latc) * math.cos(dlon)
    val sy = -rc * math.cos(latc) * math.sin(dlon)
    val sz = rc * math.sin(latc)
    if (sx * (sx - g.bigH) + sy * sy + g.invFlat2 * sz * sz >= 0.0)
      return (Double.NaN, Double.NaN)
    val r = math.sqrt(sx * sx + sy * sy + sz * sz)
    if (g.sweepX)
      (g.h * math.asin(-sy / r), g.h * math.atan(sz / sx))
    else
      (g.h * math.atan(-sy / sx), g.h * math.asin(sz / r))
  }

  def geosInverseScalar(x: Double, y: Double, g: Geos): (Double, Double) = {
    val xa = x / g.h
    val ya = y / g.h
    val (u1, u2, u3) =
      if (g.sweepX)
        (math.cos(xa) * math.cos(ya), -math.sin(xa),
          math.cos(xa) * math.sin(ya))
      else
        (math.cos(ya) * math.cos(xa), -math.cos(ya) * math.sin(xa),
          math.sin(ya))
    val aq = u1 * u1 + u2 * u2 + g.invFlat2 * u3 * u3
    val bq = -2.0 * g.bigH * u1
    val cq = g.bigH * g.bigH - g.rEq * g.rEq
    val disc = bq * bq - 4.0 * aq * cq
    if (disc < 0.0) return (Double.NaN, Double.NaN)
    val rs = (-bq - math.sqrt(disc)) / (2.0 * aq)
    val sx = rs * u1
    val sy = rs * u2
    val sz = rs * u3
    val lat = math.atan(g.invFlat2 * sz /
      math.sqrt((g.bigH - sx) * (g.bigH - sx) + sy * sy))
    (g.lon0Deg - math.toDegrees(math.atan(sy / (g.bigH - sx))),
      math.toDegrees(lat))
  }

  // ----------------------------------------------------- Equal Earth

  /** Equal Earth (Šavrič, Patterson & Jenny 2019; EPSG:8857 "WGS 84 /
    * Equal Earth Greenwich", +proj=eqearth): the equal-area pseudo-
    * cylindrical world projection. On the ellipsoid the projection runs
    * through the AUTHALIC latitude and authalic radius (the proj
    * formulation) — the same Snyder 3-12/3-18 machinery as LAEA/EASE —
    * so areas are exact on WGS84. θ solves the published polynomial by
    * Newton; the inverse's solve lives in a native codegen Expression
    * ([[graft.functions.EqEarthTheta]], the [[graft.functions.MollTheta]]
    * lesson). */
  final case class EqualEarth(lon0Deg: Double)

  /** √3/2 — the parametric-latitude scale (eq. 2). */
  val EqEarthM: Double = math.sqrt(3.0) / 2.0
  /** Authalic radius R_q = a·sqrt(Qp/2) (Snyder 3-13). */
  val AuthalicR: Double = A * math.sqrt(Qp / 2.0)

  def eqEarthForCrs(crs: String): Option[EqualEarth] = crs match {
    case "EPSG:8857" => Some(EqualEarth(0.0))
    case s if s.startsWith("EQEARTH:") =>
      s.stripPrefix("EQEARTH:").toDoubleOption.map(EqualEarth(_))
    case _ => None
  }

  import graft.functions.EqEarthTheta.{A1 => EA1, A2 => EA2, A3 => EA3, A4 => EA4}

  def eqEarthForward(lonDeg: Column, latDeg: Column, ee: EqualEarth)
      : (Column, Column) = {
    val beta = asin(qExpr(sin(radians(latDeg))) / lit(Qp))
    val theta = asin(lit(EqEarthM) * sin(beta))
    val t2 = theta * theta
    val t6 = t2 * t2 * t2
    val dp = lit(EA1) + lit(3.0 * EA2) * t2 +
      t6 * (lit(7.0 * EA3) + lit(9.0 * EA4) * t2)
    (lit(AuthalicR) * radians(lonDeg - lit(ee.lon0Deg)) * cos(theta) /
      (lit(EqEarthM) * dp),
      lit(AuthalicR) * theta * (lit(EA1) + lit(EA2) * t2 +
        t6 * (lit(EA3) + lit(EA4) * t2)))
  }

  def eqEarthInverse(x: Column, y: Column, ee: EqualEarth)
      : (Column, Column) = {
    import org.apache.spark.sql.graft.ColumnBridge
    val theta = ColumnBridge.column(graft.functions.EqEarthTheta(
      ColumnBridge.expression(y / lit(AuthalicR))))
    val t2 = theta * theta
    val t6 = t2 * t2 * t2
    val dp = lit(EA1) + lit(3.0 * EA2) * t2 +
      t6 * (lit(7.0 * EA3) + lit(9.0 * EA4) * t2)
    val beta = asin(sin(theta) / lit(EqEarthM)) // |sinθ|>M → off-map NaN
    // series seed + one exact Snyder 3-16 refinement (authalicPhi) —
    // the bare series truncates at ~1e-8 degrees
    val phi = authalicPhi(beta, lit(Qp) * sin(beta))
    val lam = x * lit(EqEarthM) * dp / (lit(AuthalicR) * cos(theta))
    (degrees(lam) + lit(ee.lon0Deg), degrees(phi))
  }

  def eqEarthForwardScalar(lonDeg: Double, latDeg: Double, ee: EqualEarth)
      : (Double, Double) = {
    val beta = math.asin(qFn(math.toRadians(latDeg)) / Qp)
    val theta = math.asin(EqEarthM * math.sin(beta))
    val t2 = theta * theta
    val t6 = t2 * t2 * t2
    val dp = EA1 + 3.0 * EA2 * t2 + t6 * (7.0 * EA3 + 9.0 * EA4 * t2)
    (AuthalicR * math.toRadians(lonDeg - ee.lon0Deg) * math.cos(theta) /
      (EqEarthM * dp),
      AuthalicR * theta * (EA1 + EA2 * t2 + t6 * (EA3 + EA4 * t2)))
  }

  def eqEarthInverseScalar(x: Double, y: Double, ee: EqualEarth)
      : (Double, Double) = {
    var theta = y / AuthalicR / EA1
    var k = 0
    while (k < graft.functions.EqEarthTheta.Steps) {
      val t2 = theta * theta
      val t6 = t2 * t2 * t2
      val f = theta * (EA1 + EA2 * t2 + t6 * (EA3 + EA4 * t2)) -
        y / AuthalicR
      val df = EA1 + 3.0 * EA2 * t2 + t6 * (7.0 * EA3 + 9.0 * EA4 * t2)
      if (math.abs(df) > 1e-14) theta = theta - f / df
      k += 1
    }
    val s = math.sin(theta) / EqEarthM
    if (math.abs(s) > 1.0) return (Double.NaN, Double.NaN)
    val t2 = theta * theta
    val t6 = t2 * t2 * t2
    val dp = EA1 + 3.0 * EA2 * t2 + t6 * (7.0 * EA3 + 9.0 * EA4 * t2)
    val beta = math.asin(s)
    val phi = authalicPhiScalar(beta, Qp * math.sin(beta))
    (math.toDegrees(x * EqEarthM * dp /
      (AuthalicR * math.cos(theta))) + ee.lon0Deg, math.toDegrees(phi))
  }

  // ------------------- Hotine oblique Mercator (EPSG methods 9812/9815)

  /** Hotine oblique Mercator — the rotated-aspect Mercator behind the
    * Borneo RSO grids (EPSG:29873, Everest 1830), Swiss LV95
    * (EPSG:2056, Bessel 1841) and Alaska zone 1. EPSG Guidance Note
    * 7-2 §1.3.6 formulation; `variantB` = method 9815 (false origin at
    * the projection CENTER, the u_c shift) vs 9812 (variant A, natural
    * origin / +no_uoff). Constants derive PER CRS from its own
    * ellipsoid like [[ObliqueStereo]]. */
  final case class HotineOm(latcDeg: Double, loncDeg: Double,
                            alphaDeg: Double, gammaDeg: Double,
                            k0: Double, x0: Double, y0: Double,
                            a: Double = A,
                            invF: Double = 298.257223563,
                            variantB: Boolean = true) {
    val fE: Double = 1.0 / invF
    val e2: Double = fE * (2 - fE)
    val e: Double = math.sqrt(e2)
    private val latc = math.toRadians(latcDeg)
    private val sc = math.sin(latc)
    val bB: Double = math.sqrt(1 + e2 * math.pow(math.cos(latc), 4) / (1 - e2))
    val bA: Double = a * bB * k0 * math.sqrt(1 - e2) / (1 - e2 * sc * sc)
    private val t0c = math.tan(math.Pi / 4 - latc / 2) /
      math.pow((1 - e * sc) / (1 + e * sc), e / 2)
    private val dD = bB * math.sqrt(1 - e2) /
      (math.cos(latc) * math.sqrt(1 - e2 * sc * sc))
    private val d2 = math.max(dD * dD, 1.0)
    private val fF = dD + math.sqrt(d2 - 1.0) * math.signum(latc)
    val hH: Double = fF * math.pow(t0c, bB)
    private val gG = (fF - 1.0 / fF) / 2.0
    val gamma0: Double = math.asin(math.sin(math.toRadians(alphaDeg)) / dD)
    val lam0: Double = math.toRadians(loncDeg) -
      math.asin(gG * math.tan(gamma0)) / bB
    val sinG0: Double = math.sin(gamma0)
    val cosG0: Double = math.cos(gamma0)
    /** u at the projection center (the variant-B shift) — evaluated as
      * the forward's OWN u at (φc, λc), where Q collapses to F: equal
      * to GN7-2's (A/B)·atan(√(D²−1)/cos αc) wherever that form is
      * defined, and the exact center→false-origin value at αc = 90°
      * (the Swiss case, where the atan form is only a limit). */
    val uC: Double =
      if (!variantB) 0.0
      else {
        val dl0 = bB * (math.toRadians(loncDeg) - lam0)
        (bA / bB) * math.atan2(gG * cosG0 + math.sin(dl0) * sinG0,
          math.cos(dl0))
      }
    val sinGc: Double = math.sin(math.toRadians(gammaDeg))
    val cosGc: Double = math.cos(math.toRadians(gammaDeg))
    // per-ellipsoid conformal inverse series (Snyder 3-5)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    private val e8 = e4 * e4
    val c2: Double = e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360
    val c4: Double = 7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520
    val c6: Double = 7 * e6 / 120 + 81 * e8 / 1120
    val c8: Double = 4279 * e8 / 161280
  }

  /** Registered: the two real-world variant-B grids with published
    * anchors plus the generic
    * `HOM:<latc>:<lonc>:<alpha>:<gamma>:<k0>:<fe>:<fn>[:A]` WGS84
    * form (`:A` = variant A / +no_uoff). */
  def hotineForCrs(crs: String): Option[HotineOm] = crs match {
    case "EPSG:29873" => Some(HotineOm( // Timbalai 1948 / RSO Borneo (m)
      4.0, 115.0, 53.31582047222222, 53.13010236111111, 0.99984,
      590476.87, 442857.65, a = 6377298.556, invF = 300.8017))
    case "EPSG:2056" => Some(HotineOm( // CH1903+ / LV95 (swiss oblique)
      46.952405555555565, 7.439583333333333, 90.0, 90.0, 1.0,
      2600000.0, 1200000.0, a = 6377397.155, invF = 299.1528128))
    case s if s.startsWith("HOM:") =>
      val parts = s.stripPrefix("HOM:").split(':')
      if (parts.length < 7 || parts.length > 8) None
      else {
        val ds = parts.take(7).map(_.toDoubleOption)
        if (ds.exists(_.isEmpty)) None
        else {
          val v = ds.map(_.get)
          val vb = parts.length < 8 || parts(7) != "A"
          Some(HotineOm(v(0), v(1), v(2), v(3), v(4), v(5), v(6),
            variantB = vb))
        }
      }
    case _ => None
  }

  /** Forward clamp: t(φ) → 0 at the poles makes Q = H/t^B overflow to
    * ∞ and U to NaN; one ulp inside keeps the (off-grid) pole images
    * finite. */
  private val HotinePoleClamp = math.Pi / 2 - 1e-12

  def hotineForward(lonDeg: Column, latDeg: Column, h: HotineOm)
      : (Column, Column) = {
    val phi = least(greatest(radians(latDeg), lit(-HotinePoleClamp)),
      lit(HotinePoleClamp))
    val dl = lit(h.bB) * (radians(lonDeg) - lit(h.lam0)) // B(λ−λ0)
    val es = lit(h.e) * sin(phi)
    val t = tan(lit(math.Pi / 4) - phi / 2) /
      pow((lit(1.0) - es) / (lit(1.0) + es), lit(h.e / 2))
    val q = lit(h.hH) / pow(t, lit(h.bB))
    val sQ = (q - lit(1.0) / q) / lit(2.0)
    val tQ = (q + lit(1.0) / q) / lit(2.0)
    val vS = sin(dl)
    val uU = (negate(vS) * lit(h.cosG0) + sQ * lit(h.sinG0)) / tQ
    val v = lit(h.bA) * log((lit(1.0) - uU) / (lit(1.0) + uU)) /
      lit(2.0 * h.bB)
    val u = lit(h.bA) * atan2(sQ * lit(h.cosG0) + vS * lit(h.sinG0),
      cos(dl)) / lit(h.bB) - lit(h.uC)
    (v * lit(h.cosGc) + u * lit(h.sinGc) + lit(h.x0),
      u * lit(h.cosGc) - v * lit(h.sinGc) + lit(h.y0))
  }

  def hotineInverse(easting: Column, northing: Column, h: HotineOm)
      : (Column, Column) = {
    val vp = (easting - lit(h.x0)) * lit(h.cosGc) -
      (northing - lit(h.y0)) * lit(h.sinGc)
    val up = (northing - lit(h.y0)) * lit(h.cosGc) +
      (easting - lit(h.x0)) * lit(h.sinGc) + lit(h.uC)
    val q = exp(negate(lit(h.bB) * vp / lit(h.bA)))
    val sQ = (q - lit(1.0) / q) / lit(2.0)
    val tQ = (q + lit(1.0) / q) / lit(2.0)
    val vS = sin(lit(h.bB) * up / lit(h.bA))
    val uU = (vS * lit(h.cosG0) + sQ * lit(h.sinG0)) / tQ
    val t = pow(lit(h.hH) / sqrt((lit(1.0) + uU) / (lit(1.0) - uU)),
      lit(1.0 / h.bB))
    val chi = lit(math.Pi / 2) - lit(2.0) * atan(t)
    val phiSeed = chi + lit(h.c2) * sin(lit(2.0) * chi) +
      lit(h.c4) * sin(lit(4.0) * chi) + lit(h.c6) * sin(lit(6.0) * chi) +
      lit(h.c8) * sin(lit(8.0) * chi)
    val esF = lit(h.e) * sin(phiSeed)
    val phi = lit(math.Pi / 2) - lit(2.0) * atan(
      t * pow((lit(1.0) - esF) / (lit(1.0) + esF), lit(h.e / 2)))
    val lam = lit(h.lam0) -
      atan2(sQ * lit(h.cosG0) - vS * lit(h.sinG0),
        cos(lit(h.bB) * up / lit(h.bA))) / lit(h.bB)
    (degrees(lam), degrees(phi))
  }

  def hotineForwardScalar(lonDeg: Double, latDeg: Double, h: HotineOm)
      : (Double, Double) = {
    val phi = math.min(math.max(math.toRadians(latDeg), -HotinePoleClamp),
      HotinePoleClamp)
    val dl = h.bB * (math.toRadians(lonDeg) - h.lam0)
    val es = h.e * math.sin(phi)
    val t = math.tan(math.Pi / 4 - phi / 2) /
      math.pow((1 - es) / (1 + es), h.e / 2)
    val q = h.hH / math.pow(t, h.bB)
    val sQ = (q - 1 / q) / 2
    val tQ = (q + 1 / q) / 2
    val vS = math.sin(dl)
    val uU = (-vS * h.cosG0 + sQ * h.sinG0) / tQ
    val v = h.bA * math.log((1 - uU) / (1 + uU)) / (2 * h.bB)
    val u = h.bA * math.atan2(sQ * h.cosG0 + vS * h.sinG0,
      math.cos(dl)) / h.bB - h.uC
    (v * h.cosGc + u * h.sinGc + h.x0, u * h.cosGc - v * h.sinGc + h.y0)
  }

  def hotineInverseScalar(x: Double, y: Double, h: HotineOm)
      : (Double, Double) = {
    val vp = (x - h.x0) * h.cosGc - (y - h.y0) * h.sinGc
    val up = (y - h.y0) * h.cosGc + (x - h.x0) * h.sinGc + h.uC
    val q = math.exp(-h.bB * vp / h.bA)
    val sQ = (q - 1 / q) / 2
    val tQ = (q + 1 / q) / 2
    val vS = math.sin(h.bB * up / h.bA)
    val uU = (vS * h.cosG0 + sQ * h.sinG0) / tQ
    val t = math.pow(h.hH / math.sqrt((1 + uU) / (1 - uU)), 1.0 / h.bB)
    val chi = math.Pi / 2 - 2 * math.atan(t)
    val phiSeed = chi + h.c2 * math.sin(2 * chi) + h.c4 * math.sin(4 * chi) +
      h.c6 * math.sin(6 * chi) + h.c8 * math.sin(8 * chi)
    val esF = h.e * math.sin(phiSeed)
    val phi = math.Pi / 2 - 2 * math.atan(
      t * math.pow((1 - esF) / (1 + esF), h.e / 2))
    val lam = h.lam0 - math.atan2(sQ * h.cosG0 - vS * h.sinG0,
      math.cos(h.bB * up / h.bA)) / h.bB
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  // ---------------------------- oblique stereographic (EPSG method 9809)

  /** Oblique ("double") stereographic — EPSG method 9809, the RD New /
    * Amersfoort family (+proj=sterea): ellipsoid → conformal sphere →
    * spherical stereographic, per EPSG Guidance Note 7-2 §1.3.7.1. All
    * constants derive PER CRS from its own ellipsoid, so non-WGS84
    * datums (Bessel 1841 for EPSG:28992) are exact — the only family
    * here that isn't WGS84-pinned. */
  final case class ObliqueStereo(lat0Deg: Double, lon0Deg: Double,
                                 k0: Double, x0: Double, y0: Double,
                                 a: Double = A,
                                 invF: Double = 298.257223563) {
    val fE: Double = 1.0 / invF
    val e2: Double = fE * (2 - fE)
    val e: Double = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0Deg)
    private val s0 = math.sin(phi0)
    val lam0: Double = math.toRadians(lon0Deg)
    val bigR: Double = math.sqrt(
      (a * (1 - e2) / math.pow(1 - e2 * s0 * s0, 1.5)) *
        (a / math.sqrt(1 - e2 * s0 * s0)))
    val n: Double =
      math.sqrt(1 + e2 * math.pow(math.cos(phi0), 4) / (1 - e2))
    private val w1 = math.pow(((1 + s0) / (1 - s0)) *
      math.pow((1 - e * s0) / (1 + e * s0), e), n)
    val c: Double = {
      val sinChi00 = (w1 - 1) / (w1 + 1)
      (n + s0) * (1 - sinChi00) / ((n - s0) * (1 + sinChi00))
    }
    val chi0: Double = { val w2 = c * w1; math.asin((w2 - 1) / (w2 + 1)) }
    val sinChi0: Double = math.sin(chi0)
    val cosChi0: Double = math.cos(chi0)
    val twoRk: Double = 2 * bigR * k0
    /** inverse constants g, h (GN7-2 names). */
    val gC: Double = twoRk * math.tan(math.Pi / 4 - chi0 / 2)
    val hC: Double = 2 * twoRk * math.tan(chi0) + gC
    // conformal-latitude inverse series for THIS ellipsoid (Snyder 3-5)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    private val e8 = e4 * e4
    val c2: Double = e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360
    val c4: Double = 7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520
    val c6: Double = 7 * e6 / 120 + 81 * e8 / 1120
    val c8: Double = 4279 * e8 / 161280
  }

  /** EPSG:28992 (Amersfoort / RD New, Bessel 1841) + the generic
    * `STEREO:<lat0>:<lon0>[:<k0>[:<fe>:<fn>]]` WGS84 form. */
  def obliqueStereoForCrs(crs: String): Option[ObliqueStereo] = crs match {
    case "EPSG:28992" => Some(ObliqueStereo(
      52.15616055555556, 5.38763888888889, 0.9999079,
      155000.0, 463000.0, a = 6377397.155, invF = 299.1528128))
    case s if s.startsWith("STEREO:") =>
      s.stripPrefix("STEREO:").split(':') match {
        case Array(la, lo) =>
          for (a1 <- la.toDoubleOption; b1 <- lo.toDoubleOption)
            yield ObliqueStereo(a1, b1, 1.0, 0.0, 0.0)
        case Array(la, lo, k) =>
          for (a1 <- la.toDoubleOption; b1 <- lo.toDoubleOption;
               k1 <- k.toDoubleOption)
            yield ObliqueStereo(a1, b1, k1, 0.0, 0.0)
        case Array(la, lo, k, fe, fn) =>
          for (a1 <- la.toDoubleOption; b1 <- lo.toDoubleOption;
               k1 <- k.toDoubleOption; f1 <- fe.toDoubleOption;
               f2 <- fn.toDoubleOption)
            yield ObliqueStereo(a1, b1, k1, f1, f2)
        case _ => None
      }
    case _ => None
  }

  /** |sinφ| clamp for the pole rows: (1+sinφ)/(1−sinφ) is ∞ at φ=±90°,
    * which would turn the (on-map) pole image into NaN; clamped one ulp
    * inside, w stays finite (~1e15^n) and sinχ lands within 1e-15 of
    * ±1 — identical bits everywhere else. */
  val ObliqueStereoPoleClamp: Double = 1.0 - 1e-15

  def obliqueStereoForward(lonDeg: Column, latDeg: Column,
                           os: ObliqueStereo): (Column, Column) = {
    val phi = radians(latDeg)
    val dLam = lit(os.n) * (radians(lonDeg) - lit(os.lam0)) // Λ − Λ0
    val sp = least(greatest(sin(phi), lit(-ObliqueStereoPoleClamp)),
      lit(ObliqueStereoPoleClamp))
    val es = lit(os.e) * sp
    val w = lit(os.c) * pow(
      ((lit(1.0) + sp) / (lit(1.0) - sp)) *
        pow((lit(1.0) - es) / (lit(1.0) + es), lit(os.e)), lit(os.n))
    val sinChi = (w - lit(1.0)) / (w + lit(1.0))
    val cosChi = sqrt(lit(1.0) - sinChi * sinChi)
    val b = lit(1.0) + sinChi * lit(os.sinChi0) +
      cosChi * lit(os.cosChi0) * cos(dLam)
    (lit(os.x0) + lit(os.twoRk) * cosChi * sin(dLam) / b,
      lit(os.y0) + lit(os.twoRk) * (sinChi * lit(os.cosChi0) -
        cosChi * lit(os.sinChi0) * cos(dLam)) / b)
  }

  def obliqueStereoInverse(easting: Column, northing: Column,
                           os: ObliqueStereo): (Column, Column) = {
    val xp = easting - lit(os.x0)
    val yp = northing - lit(os.y0)
    val iC = atan2(xp, lit(os.hC) + yp)
    val jC = atan2(xp, lit(os.gC) - yp) - iC
    val chi = lit(os.chi0) +
      lit(2.0) * atan((yp - xp * tan(jC / 2)) / lit(os.twoRk))
    val lam = (jC + lit(2.0) * iC) / lit(os.n) + lit(os.lam0)
    // isometric latitude ψ off the conformal sphere, then the
    // per-ellipsoid conformal inverse via t = e^{−ψ} (series seed +
    // one exact fixed-point pass, the stereoInverse discipline)
    val sinChi = sin(chi)
    val psi = lit(0.5) *
      log((lit(1.0) + sinChi) / (lit(os.c) * (lit(1.0) - sinChi))) /
      lit(os.n)
    val t = exp(negate(psi))
    val chiS = lit(math.Pi / 2) - lit(2.0) * atan(t)
    val phiSeed = chiS + lit(os.c2) * sin(lit(2.0) * chiS) +
      lit(os.c4) * sin(lit(4.0) * chiS) + lit(os.c6) * sin(lit(6.0) * chiS) +
      lit(os.c8) * sin(lit(8.0) * chiS)
    val esF = lit(os.e) * sin(phiSeed)
    val phi = lit(math.Pi / 2) - lit(2.0) * atan(
      t * pow((lit(1.0) - esF) / (lit(1.0) + esF), lit(os.e / 2)))
    (degrees(lam), degrees(phi))
  }

  def obliqueStereoForwardScalar(lonDeg: Double, latDeg: Double,
                                 os: ObliqueStereo): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val dLam = os.n * (math.toRadians(lonDeg) - os.lam0)
    val sp = math.min(math.max(math.sin(phi), -ObliqueStereoPoleClamp),
      ObliqueStereoPoleClamp)
    val es = os.e * sp
    val w = os.c * math.pow(((1 + sp) / (1 - sp)) *
      math.pow((1 - es) / (1 + es), os.e), os.n)
    val sinChi = (w - 1) / (w + 1)
    val cosChi = math.sqrt(1 - sinChi * sinChi)
    val b = 1 + sinChi * os.sinChi0 + cosChi * os.cosChi0 * math.cos(dLam)
    (os.x0 + os.twoRk * cosChi * math.sin(dLam) / b,
      os.y0 + os.twoRk * (sinChi * os.cosChi0 -
        cosChi * os.sinChi0 * math.cos(dLam)) / b)
  }

  def obliqueStereoInverseScalar(x: Double, y: Double,
                                 os: ObliqueStereo): (Double, Double) = {
    val xp = x - os.x0
    val yp = y - os.y0
    val iC = math.atan2(xp, os.hC + yp)
    val jC = math.atan2(xp, os.gC - yp) - iC
    val chi = os.chi0 + 2 * math.atan((yp - xp * math.tan(jC / 2)) / os.twoRk)
    val lam = (jC + 2 * iC) / os.n + os.lam0
    val sinChi = math.sin(chi)
    val psi = 0.5 * math.log((1 + sinChi) / (os.c * (1 - sinChi))) / os.n
    val t = math.exp(-psi)
    val chiS = math.Pi / 2 - 2 * math.atan(t)
    val phiSeed = chiS + os.c2 * math.sin(2 * chiS) +
      os.c4 * math.sin(4 * chiS) + os.c6 * math.sin(6 * chiS) +
      os.c8 * math.sin(8 * chiS)
    val esF = os.e * math.sin(phiSeed)
    val phi = math.Pi / 2 - 2 * math.atan(
      t * math.pow((1 - esF) / (1 + esF), os.e / 2))
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  // ----------------------- general (ellipsoidal) Mercator, EPSG 9804/9805

  /** Ellipsoidal Mercator — EPSG method 9804 (variant A, scale factor at
    * the equator) and 9805 (variant B, standard parallel), per EPSG
    * Guidance Note 7-2 §1.3.3: the EPSG:3395 / nautical-chart family the
    * CF `mercator` name reaches with standard_parallel or
    * scale_factor_at_projection_origin (reference route:
    * `pyproj.CRS.from_cf`, xcube/core/gridmapping/cfconv.py). Variant B
    * derives k0 = cosφ1/√(1−e²sin²φ1) from the standard parallel; the
    * closed forms are the iso(metric)-latitude pair already used by the
    * polar-stereographic family, with per-CRS ellipsoid constants like
    * [[ObliqueStereo]]. */
  final case class Merc(lon0Deg: Double, k0In: Double, lat1Deg: Double,
                        x0: Double, y0: Double,
                        a: Double = A,
                        invF: Double = 298.257223563,
                        variantB: Boolean = false) {
    val fE: Double = 1.0 / invF
    val e2: Double = fE * (2 - fE)
    val e: Double = math.sqrt(e2)
    /** GN7-2 §1.3.3.2: variant B's scale factor at the standard parallel. */
    val k0: Double =
      if (variantB) {
        val s1 = math.sin(math.toRadians(lat1Deg))
        math.cos(math.toRadians(lat1Deg)) / math.sqrt(1 - e2 * s1 * s1)
      } else k0In
    val aK: Double = a * k0
    val lam0: Double = math.toRadians(lon0Deg)
    // per-ellipsoid conformal inverse series (Snyder 3-5)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    private val e8 = e4 * e4
    val c2: Double = e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360
    val c4: Double = 7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520
    val c6: Double = 7 * e6 / 120 + 81 * e8 / 1120
    val c8: Double = 4279 * e8 / 161280
  }

  /** Registered: EPSG:3395 (WGS 84 / World Mercator, variant A k0=1),
    * EPSG:3002 (Makassar / NEIEZ, variant A on Bessel 1841 — the GN7-2
    * worked example), EPSG:3388 (Pulkovo 1942 / Caspian Sea Mercator,
    * variant B on Krassowsky 1940 — the GN7-2 variant-B worked example),
    * plus generic WGS84 forms `MERC:<lon0>:<k0>[:<fe>:<fn>]` (variant A)
    * and `MERCSP:<lon0>:<lat1>[:<fe>:<fn>]` (variant B). */
  def mercForCrs(crs: String): Option[Merc] = crs match {
    case "EPSG:3395" => Some(Merc(0.0, 1.0, 0.0, 0.0, 0.0))
    case "EPSG:3002" => Some(Merc(110.0, 0.997, 0.0, 3900000.0, 900000.0,
      a = 6377397.155, invF = 299.1528128))
    case "EPSG:3388" => Some(Merc(51.0, 1.0, 42.0, 0.0, 0.0,
      a = 6378245.0, invF = 298.3, variantB = true))
    case s if s.startsWith("MERCSP:") =>
      s.stripPrefix("MERCSP:").split(':') match {
        case Array(lo, sp) =>
          for (l <- lo.toDoubleOption; p <- sp.toDoubleOption)
            yield Merc(l, 1.0, p, 0.0, 0.0, variantB = true)
        case Array(lo, sp, fe, fn) =>
          for (l <- lo.toDoubleOption; p <- sp.toDoubleOption;
               f1 <- fe.toDoubleOption; f2 <- fn.toDoubleOption)
            yield Merc(l, 1.0, p, f1, f2, variantB = true)
        case _ => None
      }
    case s if s.startsWith("MERC:") =>
      s.stripPrefix("MERC:").split(':') match {
        case Array(lo, k) =>
          for (l <- lo.toDoubleOption; k1 <- k.toDoubleOption)
            yield Merc(l, k1, 0.0, 0.0, 0.0)
        case Array(lo, k, fe, fn) =>
          for (l <- lo.toDoubleOption; k1 <- k.toDoubleOption;
               f1 <- fe.toDoubleOption; f2 <- fn.toDoubleOption)
            yield Merc(l, k1, 0.0, f1, f2)
        case _ => None
      }
    case _ => None
  }

  /** Pole clamp: t(φ) → 0 at φ = 90° makes y → ∞; one ulp inside keeps
    * the (off-chart) pole rows finite, identical bits elsewhere. */
  private val MercPoleClamp = math.Pi / 2 - 1e-12

  def mercForward(lonDeg: Column, latDeg: Column, mc: Merc)
      : (Column, Column) = {
    val phi = least(greatest(radians(latDeg), lit(-MercPoleClamp)),
      lit(MercPoleClamp))
    val es = lit(mc.e) * sin(phi)
    val t = tan(lit(math.Pi / 4) - phi / 2) *
      pow((lit(1.0) + es) / (lit(1.0) - es), lit(mc.e / 2))
    (lit(mc.x0) + lit(mc.aK) * (radians(lonDeg) - lit(mc.lam0)),
      lit(mc.y0) - lit(mc.aK) * log(t))
  }

  def mercInverse(easting: Column, northing: Column, mc: Merc)
      : (Column, Column) = {
    val t = exp(negate((northing - lit(mc.y0)) / lit(mc.aK)))
    val chi = lit(math.Pi / 2) - lit(2.0) * atan(t)
    val phiSeed = chi + lit(mc.c2) * sin(lit(2.0) * chi) +
      lit(mc.c4) * sin(lit(4.0) * chi) + lit(mc.c6) * sin(lit(6.0) * chi) +
      lit(mc.c8) * sin(lit(8.0) * chi)
    val esF = lit(mc.e) * sin(phiSeed)
    val phi = lit(math.Pi / 2) - lit(2.0) * atan(
      t * pow((lit(1.0) - esF) / (lit(1.0) + esF), lit(mc.e / 2)))
    (degrees(lit(mc.lam0) + (easting - lit(mc.x0)) / lit(mc.aK)),
      degrees(phi))
  }

  def mercForwardScalar(lonDeg: Double, latDeg: Double, mc: Merc)
      : (Double, Double) = {
    val phi = math.min(math.max(math.toRadians(latDeg), -MercPoleClamp),
      MercPoleClamp)
    val es = mc.e * math.sin(phi)
    val t = math.tan(math.Pi / 4 - phi / 2) *
      math.pow((1 + es) / (1 - es), mc.e / 2)
    (mc.x0 + mc.aK * (math.toRadians(lonDeg) - mc.lam0),
      mc.y0 - mc.aK * math.log(t))
  }

  def mercInverseScalar(x: Double, y: Double, mc: Merc): (Double, Double) = {
    val t = math.exp(-(y - mc.y0) / mc.aK)
    val chi = math.Pi / 2 - 2 * math.atan(t)
    val phiSeed = chi + mc.c2 * math.sin(2 * chi) + mc.c4 * math.sin(4 * chi) +
      mc.c6 * math.sin(6 * chi) + mc.c8 * math.sin(8 * chi)
    val esF = mc.e * math.sin(phiSeed)
    val phi = math.Pi / 2 - 2 * math.atan(
      t * math.pow((1 - esF) / (1 + esF), mc.e / 2))
    (math.toDegrees(mc.lam0 + (x - mc.x0) / mc.aK), math.toDegrees(phi))
  }

  // ------------------------------ equidistant cylindrical, EPSG 1028

  /** Equidistant cylindrical (plate carrée in meters) — EPSG method 1028
    * (ellipsoidal: easting from the normal-section radius at the standard
    * parallel, northing the meridional arc; GN7-2 §1.3.14), the
    * EPSG:4087/32662 family some model outputs ship. The meridian-arc and
    * footpoint-latitude series are Snyder 3-21/3-26 with per-CRS
    * ellipsoid constants (the [[UtmOps]] series, generalized). */
  final case class Eqc(lat1Deg: Double, lon0Deg: Double,
                       x0: Double, y0: Double,
                       a: Double = A,
                       invF: Double = 298.257223563) {
    val fE: Double = 1.0 / invF
    val e2: Double = fE * (2 - fE)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    // meridian-arc series (Snyder 3-21)
    val m0: Double = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    val m2: Double = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    val m4: Double = 15 * e4 / 256 + 45 * e6 / 1024
    val m6: Double = 35 * e6 / 3072
    // footpoint-latitude series (Snyder 3-26)
    private val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val p2: Double = 3 * e1 / 2 - 27 * e1 * e1 * e1 / 32
    val p4: Double = 21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32
    val p6: Double = 151 * e1 * e1 * e1 / 96
    val p8: Double = 1097 * math.pow(e1, 4) / 512
    private val phi1 = math.toRadians(lat1Deg)
    private val s1 = math.sin(phi1)
    /** ν1·cosφ1 — the easting scale (GN7-2 1028 forward). */
    val nu1Cos: Double = a * math.cos(phi1) / math.sqrt(1 - e2 * s1 * s1)
    val lam0: Double = math.toRadians(lon0Deg)
  }

  /** Registered: EPSG:4087 (WGS 84 / World Equidistant Cylindrical) and
    * its deprecated predecessor EPSG:32662 (WGS 84 / Plate Carree) —
    * identical parameters — plus the generic WGS84 form
    * `EQC:<lat1>:<lon0>[:<fe>:<fn>]`. */
  def eqcForCrs(crs: String): Option[Eqc] = crs match {
    case "EPSG:4087" | "EPSG:32662" => Some(Eqc(0.0, 0.0, 0.0, 0.0))
    case s if s.startsWith("EQC:") =>
      s.stripPrefix("EQC:").split(':') match {
        case Array(p, lo) =>
          for (p1 <- p.toDoubleOption; l <- lo.toDoubleOption)
            yield Eqc(p1, l, 0.0, 0.0)
        case Array(p, lo, fe, fn) =>
          for (p1 <- p.toDoubleOption; l <- lo.toDoubleOption;
               f1 <- fe.toDoubleOption; f2 <- fn.toDoubleOption)
            yield Eqc(p1, l, f1, f2)
        case _ => None
      }
    case _ => None
  }

  def eqcForward(lonDeg: Column, latDeg: Column, q: Eqc): (Column, Column) = {
    val phi = radians(latDeg)
    (lit(q.x0) + lit(q.nu1Cos) * (radians(lonDeg) - lit(q.lam0)),
      lit(q.y0) + lit(q.a) * (lit(q.m0) * phi -
        lit(q.m2) * sin(lit(2.0) * phi) + lit(q.m4) * sin(lit(4.0) * phi) -
        lit(q.m6) * sin(lit(6.0) * phi)))
  }

  def eqcInverse(easting: Column, northing: Column, q: Eqc)
      : (Column, Column) = {
    val mTgt = (northing - lit(q.y0)) / lit(q.a)
    val mu = mTgt / lit(q.m0)
    val seed = mu + lit(q.p2) * sin(lit(2.0) * mu) +
      lit(q.p4) * sin(lit(4.0) * mu) + lit(q.p6) * sin(lit(6.0) * mu) +
      lit(q.p8) * sin(lit(8.0) * mu)
    // one Newton pass against the forward's OWN (truncated) arc series —
    // the footpoint seed alone leaves ~4e-9° at high latitude
    val mSeed = lit(q.m0) * seed - lit(q.m2) * sin(lit(2.0) * seed) +
      lit(q.m4) * sin(lit(4.0) * seed) - lit(q.m6) * sin(lit(6.0) * seed)
    val dM = lit(q.m0) - lit(2.0) * lit(q.m2) * cos(lit(2.0) * seed) +
      lit(4.0) * lit(q.m4) * cos(lit(4.0) * seed) -
      lit(6.0) * lit(q.m6) * cos(lit(6.0) * seed)
    val phi = seed + (mTgt - mSeed) / dM
    (degrees(lit(q.lam0) + (easting - lit(q.x0)) / lit(q.nu1Cos)),
      degrees(phi))
  }

  def eqcForwardScalar(lonDeg: Double, latDeg: Double, q: Eqc)
      : (Double, Double) = {
    val phi = math.toRadians(latDeg)
    (q.x0 + q.nu1Cos * (math.toRadians(lonDeg) - q.lam0),
      q.y0 + q.a * (q.m0 * phi - q.m2 * math.sin(2 * phi) +
        q.m4 * math.sin(4 * phi) - q.m6 * math.sin(6 * phi)))
  }

  def eqcInverseScalar(x: Double, y: Double, q: Eqc): (Double, Double) = {
    val mTgt = (y - q.y0) / q.a
    val mu = mTgt / q.m0
    val seed = mu + q.p2 * math.sin(2 * mu) + q.p4 * math.sin(4 * mu) +
      q.p6 * math.sin(6 * mu) + q.p8 * math.sin(8 * mu)
    val mSeed = q.m0 * seed - q.m2 * math.sin(2 * seed) +
      q.m4 * math.sin(4 * seed) - q.m6 * math.sin(6 * seed)
    val dM = q.m0 - 2 * q.m2 * math.cos(2 * seed) +
      4 * q.m4 * math.cos(4 * seed) - 6 * q.m6 * math.cos(6 * seed)
    val phi = seed + (mTgt - mSeed) / dM
    (math.toDegrees(q.lam0 + (x - q.x0) / q.nu1Cos), math.toDegrees(phi))
  }

  // ------------------- general transverse Mercator (Gauss-Kruger), 9807

  /** Transverse Mercator on an arbitrary ellipsoid with arbitrary natural
    * origin — the Gauss-Krüger / national-grid generalization of
    * [[UtmOps]] (same Snyder PP-1395 8-9..8-25 series, constants derived
    * per CRS instead of the WGS84 object constants; accurate to
    * millimeters within ~3° of the central meridian). Closes Missing #1c:
    * non-WGS84 tmerc granules (DHDN Gauss-Krüger, OSGB) the reference
    * reaches via pyproj. */
  final case class Tmerc(lat0Deg: Double, lon0Deg: Double, k0: Double,
                         x0: Double, y0: Double,
                         a: Double = A,
                         invF: Double = 298.257223563) {
    val fE: Double = 1.0 / invF
    val e2: Double = fE * (2 - fE)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    val ep2: Double = e2 / (1 - e2)
    val m0: Double = 1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256
    val m2: Double = 3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024
    val m4: Double = 15 * e4 / 256 + 45 * e6 / 1024
    val m6: Double = 35 * e6 / 3072
    private val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val p2: Double = 3 * e1 / 2 - 27 * e1 * e1 * e1 / 32
    val p4: Double = 21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32
    val p6: Double = 151 * e1 * e1 * e1 / 96
    val p8: Double = 1097 * math.pow(e1, 4) / 512
    val lon0: Double = lon0Deg
    /** Meridian arc at the latitude of natural origin (Snyder 3-21). */
    val mArc0: Double = {
      val phi0 = math.toRadians(lat0Deg)
      a * (m0 * phi0 - m2 * math.sin(2 * phi0) + m4 * math.sin(4 * phi0) -
        m6 * math.sin(6 * phi0))
    }
  }

  /** Registered: EPSG:27700 (OSGB36 / British National Grid, Airy 1830 —
    * the GN7-2 §1.3.5.1 worked example) and EPSG:31467 (DHDN /
    * 3-degree Gauss-Krüger zone 3, Bessel 1841), plus the generic WGS84
    * form `TMERC:<lat0>:<lon0>:<k0>:<fe>:<fn>`. */
  def tmercForCrs(crs: String): Option[Tmerc] = crs match {
    case "EPSG:27700" => Some(Tmerc(49.0, -2.0, 0.9996012717,
      400000.0, -100000.0, a = 6377563.396, invF = 299.3249646))
    case "EPSG:31467" => Some(Tmerc(0.0, 9.0, 1.0, 3500000.0, 0.0,
      a = 6377397.155, invF = 299.1528128))
    case s if s.startsWith("TMERC:") =>
      s.stripPrefix("TMERC:").split(':') match {
        case Array(la, lo, k, fe, fn) =>
          for (a1 <- la.toDoubleOption; b1 <- lo.toDoubleOption;
               k1 <- k.toDoubleOption; f1 <- fe.toDoubleOption;
               f2 <- fn.toDoubleOption)
            yield Tmerc(a1, b1, k1, f1, f2)
        case _ => None
      }
    case _ => None
  }

  def tmercForward(lonDeg: Column, latDeg: Column, tm: Tmerc)
      : (Column, Column) = {
    val phi = radians(latDeg)
    val lam = radians(lonDeg - lit(tm.lon0))
    val sinPhi = sin(phi)
    val cosPhi = cos(phi)
    val tanPhi = tan(phi)
    val n = lit(tm.a) / sqrt(lit(1.0) - lit(tm.e2) * sinPhi * sinPhi)
    val t = tanPhi * tanPhi
    val c = lit(tm.ep2) * cosPhi * cosPhi
    val a1 = lam * cosPhi
    val a2 = a1 * a1
    val a3 = a2 * a1
    val a4 = a2 * a2
    val a5 = a4 * a1
    val a6 = a4 * a2
    val m = lit(tm.a) * (lit(tm.m0) * phi - lit(tm.m2) * sin(lit(2.0) * phi) +
      lit(tm.m4) * sin(lit(4.0) * phi) - lit(tm.m6) * sin(lit(6.0) * phi))
    val x = lit(tm.k0) * n * (a1 + (lit(1.0) - t + c) * a3 / lit(6.0) +
      (lit(5.0) - lit(18.0) * t + t * t + lit(72.0) * c -
        lit(58.0) * lit(tm.ep2)) * a5 / lit(120.0)) + lit(tm.x0)
    val y = lit(tm.k0) * (m - lit(tm.mArc0) + n * tanPhi * (a2 / lit(2.0) +
      (lit(5.0) - t + lit(9.0) * c + lit(4.0) * c * c) * a4 / lit(24.0) +
      (lit(61.0) - lit(58.0) * t + t * t + lit(600.0) * c -
        lit(330.0) * lit(tm.ep2)) * a6 / lit(720.0))) + lit(tm.y0)
    (x, y)
  }

  def tmercInverse(easting: Column, northing: Column, tm: Tmerc)
      : (Column, Column) = {
    val m = (northing - lit(tm.y0)) / lit(tm.k0) + lit(tm.mArc0)
    val mu = m / lit(tm.a * tm.m0)
    val phi1 = mu + lit(tm.p2) * sin(lit(2.0) * mu) +
      lit(tm.p4) * sin(lit(4.0) * mu) + lit(tm.p6) * sin(lit(6.0) * mu) +
      lit(tm.p8) * sin(lit(8.0) * mu)
    val sinP = sin(phi1)
    val cosP = cos(phi1)
    val tanP = tan(phi1)
    val c1 = lit(tm.ep2) * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = lit(1.0) - lit(tm.e2) * sinP * sinP
    val n1 = lit(tm.a) / sqrt(oneMinus)
    val r1 = lit(tm.a * (1 - tm.e2)) / pow(oneMinus, lit(1.5))
    val d = (easting - lit(tm.x0)) / (n1 * lit(tm.k0))
    val d2 = d * d
    val d3 = d2 * d
    val d4 = d2 * d2
    val d5 = d4 * d
    val d6 = d4 * d2
    val lat = degrees(phi1 - (n1 * tanP / r1) * (d2 / lit(2.0) -
      (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 -
        lit(9.0) * lit(tm.ep2)) * d4 / lit(24.0) +
      (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
        lit(252.0) * lit(tm.ep2) - lit(3.0) * c1 * c1) * d6 / lit(720.0)))
    val lon = lit(tm.lon0) + degrees((d - (lit(1.0) + lit(2.0) * t1 + c1) *
      d3 / lit(6.0) +
      (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
        lit(8.0) * lit(tm.ep2) + lit(24.0) * t1 * t1) * d5 / lit(120.0)) / cosP)
    (lon, lat)
  }

  def tmercForwardScalar(lonDeg: Double, latDeg: Double, tm: Tmerc)
      : (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg - tm.lon0)
    val sinPhi = math.sin(phi); val cosPhi = math.cos(phi)
    val tanPhi = math.tan(phi)
    val n = tm.a / math.sqrt(1 - tm.e2 * sinPhi * sinPhi)
    val t = tanPhi * tanPhi
    val c = tm.ep2 * cosPhi * cosPhi
    val a1 = lam * cosPhi
    val m = tm.a * (tm.m0 * phi - tm.m2 * math.sin(2 * phi) +
      tm.m4 * math.sin(4 * phi) - tm.m6 * math.sin(6 * phi))
    val x = tm.k0 * n * (a1 + (1 - t + c) * math.pow(a1, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * tm.ep2) * math.pow(a1, 5) / 120) +
      tm.x0
    val y = tm.k0 * (m - tm.mArc0 + n * tanPhi * (a1 * a1 / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(a1, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * tm.ep2) *
        math.pow(a1, 6) / 720)) + tm.y0
    (x, y)
  }

  def tmercInverseScalar(x: Double, y: Double, tm: Tmerc)
      : (Double, Double) = {
    val m = (y - tm.y0) / tm.k0 + tm.mArc0
    val mu = m / (tm.a * tm.m0)
    val phi1 = mu + tm.p2 * math.sin(2 * mu) + tm.p4 * math.sin(4 * mu) +
      tm.p6 * math.sin(6 * mu) + tm.p8 * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1)
    val tanP = math.tan(phi1)
    val c1 = tm.ep2 * cosP * cosP
    val t1 = tanP * tanP
    val oneMinus = 1 - tm.e2 * sinP * sinP
    val n1 = tm.a / math.sqrt(oneMinus)
    val r1 = tm.a * (1 - tm.e2) / math.pow(oneMinus, 1.5)
    val d = (x - tm.x0) / (n1 * tm.k0)
    val lat = math.toDegrees(phi1 - (n1 * tanP / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * tm.ep2) *
        math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * tm.ep2 -
        3 * c1 * c1) * math.pow(d, 6) / 720))
    val lon = tm.lon0 + math.toDegrees((d - (1 + 2 * t1 + c1) *
      math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * tm.ep2 + 24 * t1 * t1) *
        math.pow(d, 5) / 120) / cosP)
    (lon, lat)
  }
}
