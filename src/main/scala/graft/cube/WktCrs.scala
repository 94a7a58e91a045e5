package graft.cube

/** WKT1/WKT2 CRS parsing onto the registered family set — the
  * `pyproj.CRS.from_wkt` analog for granules that ship ONLY a
  * `crs_wkt`/`spatial_ref` string (reference cfconv.py reaches them via
  * pyproj; gridmapping/base.py:808 `from_dataset`).
  *
  * Strategy: structural parse (a WKT document is a uniform tree of
  * `NAME[arg, ...]` nodes), then translate the PROJECTION (WKT1) /
  * METHOD (WKT2) name and PARAMETER clauses into the CF grid-mapping
  * attribute vocabulary and hand the result to
  * [[CfGridMapping.crsFromCf]] — one shared registry, one shared
  * decline-loudly rule. A projected WKT whose method or parameters
  * don't land on a registered family THROWS (silently falling back to
  * geographic would misplace every pixel); a geographic-only WKT
  * resolves to CRS84; a string that isn't WKT at all returns None.
  */
object WktCrs {

  /** One WKT node: keyword, quoted-string / numeric / child arguments. */
  final case class Node(name: String, args: Seq[Any]) {
    def children: Seq[Node] = args.collect { case n: Node => n }
    def strings: Seq[String] = args.collect { case s: String => s }
    def numbers: Seq[Double] = args.collect { case d: Double => d }
    /** First descendant (depth-first) with the given keyword. */
    def find(keyword: String): Option[Node] =
      if (name.equalsIgnoreCase(keyword)) Some(this)
      else children.view.flatMap(_.find(keyword)).headOption
    def findAll(keyword: String): Seq[Node] =
      (if (name.equalsIgnoreCase(keyword)) Seq(this) else Nil) ++
        children.flatMap(_.findAll(keyword))
  }

  /** Parse a WKT document; None when the text isn't WKT-shaped. */
  def parse(wkt: String): Option[Node] = {
    val s = wkt.trim
    val it = new Cursor(s)
    try {
      val n = it.node()
      it.skipWs()
      if (it.done) Some(n) else None
    } catch { case _: MatchError | _: IllegalArgumentException => None }
  }

  private final class Cursor(s: String) {
    private var p = 0
    def done: Boolean = p >= s.length
    def skipWs(): Unit = while (!done && s(p).isWhitespace) p += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WKT parse: $msg at offset $p")
    private def ident(): String = {
      skipWs()
      val start = p
      while (!done && (s(p).isLetterOrDigit || s(p) == '_')) p += 1
      if (p == start) fail("keyword expected")
      s.substring(start, p)
    }
    def node(): Node = {
      val name = ident()
      skipWs()
      if (done || (s(p) != '[' && s(p) != '(')) fail("'[' expected")
      body(name)
    }
    private def body(name: String): Node = {
      val close = if (s(p) == '[') ']' else ')'
      p += 1
      val args = Seq.newBuilder[Any]
      var first = true
      while ({ skipWs(); done || s(p) != close }) {
        if (done) fail("unterminated node")
        if (!first) {
          if (s(p) != ',') fail("',' expected")
          p += 1; skipWs()
        }
        first = false
        if (done) fail("argument expected")
        s(p) match {
          case '"' =>
            p += 1
            val b = new StringBuilder
            while (!done && !(s(p) == '"' &&
              (p + 1 >= s.length || s(p + 1) != '"'))) {
              if (s(p) == '"') { b += '"'; p += 2 } // WKT2 escaped quote
              else { b += s(p); p += 1 }
            }
            if (done) fail("unterminated string")
            p += 1
            args += b.result()
          case c if c.isLetter || c == '_' =>
            // a keyword either opens a child node or stands bare (WKT2
            // enumerations: CS[Cartesian,2], AXIS[...,north], ...)
            val id = ident()
            skipWs()
            if (!done && (s(p) == '[' || s(p) == '(')) args += body(id)
            else args += id
          case _ =>
            val ns = p
            while (!done && !s(p).isWhitespace && s(p) != ',' &&
              s(p) != close) p += 1
            val tok = s.substring(ns, p)
            args += tok.toDoubleOption.getOrElse(fail(s"bad token '$tok'"))
        }
      }
      if (done) fail("unterminated node") else p += 1
      Node(name.toUpperCase, args.result())
    }
  }

  // ------------------------------------------------------------------
  // WKT -> CF attribute translation
  // ------------------------------------------------------------------

  /** Normalize a projection/parameter name: lowercase, non-alphanumeric
    * collapsed to single underscores. "Lambert Conic Conformal (2SP)"
    * and "Lambert_Conformal_Conic_2SP" normalize identically enough for
    * keyword matching. */
  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")

  /** WKT1 PROJECTION / WKT2 METHOD name -> CF grid_mapping_name. */
  private val Methods: Seq[(String => Boolean, String)] = Seq(
    ((n: String) => n.contains("pseudo_mercator") ||
      n.contains("popular_visualisation"),
      "popular_visualisation_pseudo_mercator"),
    ((n: String) => n.contains("transverse_mercator") &&
      !n.contains("south"), "transverse_mercator"),
    ((n: String) => n.contains("hotine") || n.contains("oblique_mercator") ||
      n.contains("rectified_skew") || n.contains("swiss_oblique"),
      "oblique_mercator"),
    ((n: String) => n.contains("mercator"), "mercator"),
    ((n: String) => n.contains("lambert") && n.contains("azimuthal"),
      "lambert_azimuthal_equal_area"),
    ((n: String) => n.contains("lambert") && n.contains("cylindrical"),
      "lambert_cylindrical_equal_area"),
    ((n: String) => n.startsWith("cylindrical_equal_area"),
      "lambert_cylindrical_equal_area"),
    ((n: String) => n.contains("lambert") && (n.contains("conformal") ||
      n.contains("conic_conformal")), "lambert_conformal_conic"),
    ((n: String) => n.contains("albers"), "albers_conical_equal_area"),
    ((n: String) => n.contains("polar_stereographic"),
      "polar_stereographic"),
    // ONLY names that denote the EPSG 9809 double form — plain
    // "Stereographic" (proj stere) agrees with it only at the origin
    // (meters of divergence at country scale; ADVICE r19) and falls
    // through to the loud unregistered-method decline
    ((n: String) => n.contains("oblique_stereographic") ||
      n.contains("double_stereographic"), "oblique_stereographic"),
    ((n: String) => n.contains("equirectangular") ||
      n.contains("equidistant_cylindrical") ||
      n.contains("plate_carree"), "equirectangular"),
    ((n: String) => n.contains("sinusoidal"), "sinusoidal"),
    ((n: String) => n.contains("equal_earth"), "equal_earth"),
    ((n: String) => n.contains("orthographic"), "orthographic"),
    ((n: String) => n.contains("mollweide"), "mollweide"),
    ((n: String) => n.contains("geostationary"), "geostationary"))

  /** WKT parameter name -> CF parameter name, per grid-mapping family
    * (the same WKT name maps differently across families — WKT1
    * `central_meridian` is CF `longitude_of_central_meridian` for
    * conic/cylindrical families but `longitude_of_projection_origin`
    * for azimuthal ones). */
  private def cfParamName(family: String, wktName: String): Option[String] = {
    val n = norm(wktName)
    val azimuthal = Set("lambert_azimuthal_equal_area", "orthographic",
      "stereographic", "oblique_stereographic", "polar_stereographic",
      "geostationary", "mollweide", "oblique_mercator").contains(family)
    n match {
      case "central_meridian" | "longitude_of_natural_origin" |
           "longitude_of_false_origin" | "longitude_of_center" |
           "longitude_of_centre" | "longitude_of_projection_centre" =>
        Some(if (azimuthal || family == "mercator")
          "longitude_of_projection_origin"
        else "longitude_of_central_meridian")
      case "latitude_of_origin" | "latitude_of_natural_origin" |
           "latitude_of_false_origin" | "latitude_of_center" |
           "latitude_of_centre" | "latitude_of_projection_centre" =>
        Some("latitude_of_projection_origin")
      case "longitude_of_origin" if family == "polar_stereographic" =>
        Some("straight_vertical_longitude_from_pole")
      case "longitude_of_origin" => Some("longitude_of_projection_origin")
      case "scale_factor" | "scale_factor_at_natural_origin" =>
        Some(if (family == "transverse_mercator")
          "scale_factor_at_central_meridian"
        else "scale_factor_at_projection_origin")
      case "standard_parallel_1" | "standard_parallel" |
           "latitude_of_1st_standard_parallel" |
           "latitude_of_standard_parallel" => Some("standard_parallel_1")
      case "standard_parallel_2" | "latitude_of_2nd_standard_parallel" =>
        Some("standard_parallel_2")
      case "false_easting" | "easting_at_false_origin" |
           "easting_at_projection_centre" => Some("false_easting")
      case "false_northing" | "northing_at_false_origin" |
           "northing_at_projection_centre" => Some("false_northing")
      case "satellite_height" | "perspective_point_height" =>
        Some("perspective_point_height")
      case "azimuth" | "azimuth_at_projection_centre" |
           "azimuth_of_initial_line" | "azimuth_of_central_line" =>
        Some("azimuth_of_central_line")
      case "rectified_grid_angle" | "angle_from_rectified_to_skew_grid" |
           "angle_from_rectified_to_skewed_grid" =>
        Some("rectified_grid_angle")
      case _ => None // unit conversions, azimuths, ... — unused by CF map
    }
  }

  // ------------------------------------------------------------------
  // PROJ string -> CF attribute translation (pyproj CRS.from_proj4)
  // ------------------------------------------------------------------

  private val Ellipsoids: Map[String, (Double, Double)] = Map(
    "wgs84" -> (6378137.0, 298.257223563),
    "grs80" -> (6378137.0, 298.257222101),
    "bessel" -> (6377397.155, 299.1528128),
    "evrstss" -> (6377298.556, 300.8017), // Everest 1830 (1967 / SS)
    "airy" -> (6377563.396, 299.3249646),
    "krass" -> (6378245.0, 298.3),
    "intl" -> (6378388.0, 297.0))

  /** CF attribute map encoded by a `+proj=...` string, or None when the
    * text isn't a proj string. The same family/decline rules as
    * [[toCfAttrs]]: recognized projections translate onto CF names for
    * [[CfGridMapping.crsFromCf]]; unrecognized `+proj` values throw. */
  def projToCfAttrs(s: String): Option[Map[String, String]] = {
    val t = s.trim
    if (!t.startsWith("+")) return None
    val kv = t.split("\\s+").filter(_.startsWith("+")).map(_.drop(1))
      .map { tok =>
        tok.split("=", 2) match {
          case Array(k, v) => k -> v
          case Array(k) => k -> ""
        }
      }.toMap
    val proj = kv.getOrElse("proj", return None)
    def num(k: String): Option[Double] = kv.get(k).flatMap(_.toDoubleOption)
    def p(cf: String, k: String, dflt: Option[Double] = None)
        : Seq[(String, String)] =
      num(k).orElse(dflt).map(v => cf -> v.toString).toSeq
    val ellipsoid: Seq[(String, String)] = {
      val byName = kv.get("ellps").flatMap(e => Ellipsoids.get(e.toLowerCase))
      val aOpt = num("a").orElse(byName.map(_._1))
      val rfOpt = num("rf").orElse(num("b").flatMap(b =>
        aOpt.map(a => if (b == a) 0.0 else a / (a - b))))
        .orElse(byName.map(_._2))
      (aOpt.map(v => "semi_major_axis" -> v.toString) ++
        rfOpt.map(v => "inverse_flattening" -> v.toString)).toSeq
    }
    val base: Seq[(String, String)] = proj match {
      case "longlat" | "latlong" | "latlon" | "lonlat" =>
        Seq("grid_mapping_name" -> "latitude_longitude")
      case "utm" =>
        val zone = num("zone").getOrElse(throw new IllegalArgumentException(
          "+proj=utm requires +zone")).toInt
        Seq("grid_mapping_name" -> "transverse_mercator",
          "longitude_of_central_meridian" -> (zone * 6.0 - 183.0).toString,
          "latitude_of_projection_origin" -> "0.0",
          "scale_factor_at_central_meridian" -> "0.9996",
          "false_easting" -> "500000.0",
          "false_northing" -> (if (kv.contains("south")) "1.0E7" else "0.0"))
      case "tmerc" =>
        Seq("grid_mapping_name" -> "transverse_mercator") ++
          p("longitude_of_central_meridian", "lon_0", Some(0.0)) ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("scale_factor_at_central_meridian", "k_0",
            Some(num("k").getOrElse(1.0))) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "stere" if num("lat_0").exists(l => math.abs(l) > 89.999) =>
        Seq("grid_mapping_name" -> "polar_stereographic",
          "latitude_of_projection_origin" ->
            num("lat_0").get.toString) ++
          p("standard_parallel", "lat_ts") ++
          // no lat_ts -> the variant-A (UPS) scale-factor form; proj's
          // k default is 1
          (if (num("lat_ts").isEmpty)
            p("scale_factor_at_projection_origin", "k_0",
              Some(num("k").getOrElse(1.0)))
          else Nil) ++
          p("straight_vertical_longitude_from_pole", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "stere" =>
        // non-polar plain stereographic (EPSG 9810 family): agrees with
        // the registered double form only at the origin — decline
        // loudly rather than coerce (ADVICE r19)
        throw new IllegalArgumentException(
          "+proj=stere away from the poles has no registered closed " +
            "form — only the double stereographic (+proj=sterea, EPSG " +
            "9809) is registered; the two agree only at the origin")
      case "sterea" =>
        // the double stereographic (EPSG 9809) closed form
        Seq("grid_mapping_name" -> "oblique_stereographic") ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0)) ++
          p("scale_factor_at_projection_origin", "k_0",
            Some(num("k").getOrElse(1.0))) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "laea" =>
        Seq("grid_mapping_name" -> "lambert_azimuthal_equal_area") ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "lcc" =>
        val sp = (num("lat_1").toSeq ++ num("lat_2").toSeq)
        Seq("grid_mapping_name" -> "lambert_conformal_conic",
          "standard_parallel" -> sp.mkString(",")) ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_central_meridian", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "aea" =>
        Seq("grid_mapping_name" -> "albers_conical_equal_area",
          "standard_parallel" ->
            (num("lat_1").toSeq ++ num("lat_2").toSeq).mkString(",")) ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_central_meridian", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "cea" =>
        Seq("grid_mapping_name" -> "lambert_cylindrical_equal_area") ++
          p("standard_parallel", "lat_ts", Some(0.0)) ++
          p("longitude_of_central_meridian", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "sinu" =>
        // the proj defaults (lon_0 = x_0 = y_0 = 0) are emitted
        // explicitly so a shifted sinusoidal hits the strict checks
        Seq("grid_mapping_name" -> "sinusoidal") ++
          p("longitude_of_central_meridian", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "eqearth" =>
        Seq("grid_mapping_name" -> "equal_earth") ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0))
      case "ortho" =>
        Seq("grid_mapping_name" -> "orthographic") ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0))
      case "moll" =>
        Seq("grid_mapping_name" -> "mollweide") ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0))
      case "geos" =>
        Seq("grid_mapping_name" -> "geostationary",
          "sweep_angle_axis" -> kv.getOrElse("sweep", "y")) ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0)) ++
          p("perspective_point_height", "h")
      case "omerc" =>
        val alpha = num("alpha").getOrElse(
          throw new IllegalArgumentException("+proj=omerc requires +alpha"))
        Seq("grid_mapping_name" -> "oblique_mercator",
          "azimuth_of_central_line" -> alpha.toString,
          "rectified_grid_angle" ->
            num("gamma").getOrElse(alpha).toString) ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_projection_origin", "lonc", Some(0.0)) ++
          p("scale_factor_at_projection_origin", "k_0",
            Some(num("k").getOrElse(1.0))) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0)) ++
          (if (kv.contains("no_uoff") || kv.contains("no_off"))
            Seq("no_uoff" -> "true") else Nil)
      case "somerc" =>
        // the Swiss oblique Mercator: omerc with alpha = gamma = 90
        Seq("grid_mapping_name" -> "oblique_mercator",
          "azimuth_of_central_line" -> "90.0",
          "rectified_grid_angle" -> "90.0") ++
          p("latitude_of_projection_origin", "lat_0", Some(0.0)) ++
          p("longitude_of_projection_origin", "lon_0", Some(0.0)) ++
          p("scale_factor_at_projection_origin", "k_0",
            Some(num("k").getOrElse(1.0))) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case "webmerc" =>
        Seq("grid_mapping_name" -> "popular_visualisation_pseudo_mercator")
      case "merc" =>
        // spherical (+R, or +a == +b) is web-mercator; otherwise the
        // ellipsoidal 9804/9805 family (proj defaults to WGS84 when no
        // ellipsoid is given). lat_ts is variant B, k is variant A.
        val spherical = kv.contains("R") ||
          ((num("a"), num("b")) match {
            case (Some(a), Some(b)) => a == b
            case _ => false
          })
        if (spherical)
          Seq("grid_mapping_name" -> "popular_visualisation_pseudo_mercator")
        else
          Seq("grid_mapping_name" -> "mercator",
            // proj default ellipsoid is WGS84: make it explicit so the
            // CF branch takes the ellipsoidal (EPSG:3395-family) path
            "semi_major_axis" -> num("a").getOrElse(6378137.0).toString,
            "inverse_flattening" ->
              num("rf").getOrElse(298.257223563).toString) ++
            p("standard_parallel", "lat_ts") ++
            (if (num("lat_ts").isEmpty)
              p("scale_factor_at_projection_origin", "k_0",
                Some(num("k").getOrElse(1.0)))
            else Nil) ++
            p("longitude_of_projection_origin", "lon_0", Some(0.0)) ++
            p("false_easting", "x_0", Some(0.0)) ++
            p("false_northing", "y_0", Some(0.0))
      case "eqc" =>
        // equidistant cylindrical (EPSG 1028): lat_ts is the standard
        // parallel; a nonzero lat_0 would be a latitude-of-origin shift
        // EPSG 1028 does not define
        if (num("lat_0").exists(v => math.abs(v) > 1e-9))
          throw new IllegalArgumentException(
            "+proj=eqc with a nonzero +lat_0 has no registered closed " +
              "form (EPSG 1028 defines no latitude-of-origin shift)")
        Seq("grid_mapping_name" -> "equirectangular") ++
          p("standard_parallel", "lat_ts", Some(0.0)) ++
          p("longitude_of_central_meridian", "lon_0", Some(0.0)) ++
          p("false_easting", "x_0", Some(0.0)) ++
          p("false_northing", "y_0", Some(0.0))
      case other => throw new IllegalArgumentException(
        s"+proj=$other has no registered closed form (SpatialOps' " +
          "family set) — re-project the source, or register the family")
    }
    // ellipsoid attrs forwarded for EVERY family (last-wins over any
    // branch-local defaults): the pinned families' ellOk guard must see
    // a declared non-WGS84 figure (e.g. +proj=utm +ellps=intl is ED50
    // UTM, ~200 m off the WGS84 zone code it would otherwise match)
    Some((base ++ ellipsoid).toMap)
  }

  /** GDAL WKT1 rides the TRUE projection semantics in an
    * EXTENSION["PROJ4", "..."] clause when WKT1 cannot express them —
    * the spherical pseudo-mercator inside a Mercator_1SP document being
    * the classic case (WKT1 for EPSG:3857 and EPSG:3395 is otherwise
    * identical up to the spheroid). When present and registered, it
    * wins over the structural PROJECTION/PARAMETER translation. */
  private def proj4Extension(root: Node): Option[Map[String, String]] =
    root.findAll("EXTENSION")
      .find(_.strings.headOption.exists(_.equalsIgnoreCase("PROJ4")))
      .flatMap(_.strings.drop(1).headOption)
      .flatMap(p => scala.util.Try(projToCfAttrs(p)).toOption.flatten)

  /** CF attribute map encoded by a WKT document, or None when `wkt`
    * isn't WKT. Geographic-only documents yield the latitude_longitude
    * mapping; projected documents yield the translated family +
    * parameters (which [[CfGridMapping.crsFromCf]] then matches against
    * the registered set, throwing for unregistered combinations). */
  def toCfAttrs(wkt: String): Option[Map[String, String]] =
    parse(wkt).flatMap { root =>
      val isProjected = Set("PROJCS", "PROJCRS", "PROJECTEDCRS")
        .contains(root.name)
      val isGeographic = Set("GEOGCS", "GEOGCRS", "GEOGRAPHICCRS",
        "GEODCRS", "GEODETICCRS").contains(root.name)
      if (isGeographic)
        Some(Map("grid_mapping_name" -> "latitude_longitude"))
      else if (!isProjected) None
      else if (proj4Extension(root).isDefined) proj4Extension(root)
      else {
        val methodNode = root.find("PROJECTION").orElse(root.find("METHOD"))
        val methodName = methodNode.flatMap(_.strings.headOption)
          .map(norm).getOrElse(throw new IllegalArgumentException(
            s"projected WKT '${root.strings.headOption.getOrElse("?")}' " +
              "carries no PROJECTION/METHOD clause"))
        val family = Methods.collectFirst {
          case (m, cf) if m(methodName) => cf
        }.getOrElse(throw new IllegalArgumentException(
          s"WKT projection method '$methodName' has no registered " +
            "closed form (SpatialOps' family set) — re-project the " +
            "source, or register the family first"))
        // geostationary sweep axis rides the method name in WKT2
        val sweep =
          if (family != "geostationary") None
          else if (methodName.contains("sweep_x")) Some("x")
          else Some("y")
        val params = Map.newBuilder[String, String]
        params += "grid_mapping_name" -> family
        sweep.foreach(a => params += "sweep_angle_axis" -> a)
        // Hotine variant: plain WKT1 "Hotine_Oblique_Mercator" is
        // variant A (natural origin, +no_uoff); the Azimuth_Center /
        // variant-B / RSO / Swiss names are variant B
        if (family == "oblique_mercator" && methodName.contains("hotine") &&
          !methodName.contains("azimuth_center") &&
          !methodName.contains("variant_b"))
          params += "no_uoff" -> "true"
        // ellipsoid, when the document carries one — the stereographic
        // branch keys the RD New (Bessel 1841) registration off it
        root.find("SPHEROID").orElse(root.find("ELLIPSOID")).foreach { el =>
          el.numbers.take(2) match {
            case Seq(a, invF) =>
              params += "semi_major_axis" -> a.toString
              params += "inverse_flattening" -> invF.toString
            case _ =>
          }
        }
        val sp = scala.collection.mutable.SortedMap.empty[Int, Double]
        root.findAll("PARAMETER").foreach { pn =>
          (pn.strings.headOption, pn.numbers.headOption) match {
            case (Some(wname), Some(v)) =>
              cfParamName(family, wname).foreach {
                case "standard_parallel_1" => sp(1) = v
                case "standard_parallel_2" => sp(2) = v
                case cf => params += cf -> v.toString
              }
            case _ =>
          }
        }
        if (sp.nonEmpty)
          params += "standard_parallel" -> sp.values.mkString(",")
        Some(params.result())
      }
    }
}
