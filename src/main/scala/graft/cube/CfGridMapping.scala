package graft.cube

import graft.operators.{PolarOps, UtmOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CF grid-mapping conventions: derive a [[GridMapping]] from dataset
  * metadata, and emit the CF attributes back when writing.
  *
  * Reference behavior: `xcube/core/gridmapping/cfconv.py:1-353` (find the
  * CRS variable referenced by data vars' `grid_mapping` attribute, else a
  * variable carrying CRS attributes itself; find x/y coordinate variables
  * by CF `standard_name`, else by common naming), `base.py:808`
  * (`GridMapping.from_dataset`), `base.py:851` (`from_coords`),
  * `base.py:787` (`to_regular`), `coords.py:84-300` (resolution and
  * regularity from coordinate deltas, inverted-y detection, the
  * area-based resolution estimate for 2-D coords), `helpers.py:137`
  * (`round_to_fraction`).
  *
  * The reference resolves CF parameters through pyproj; this library's
  * CRS registry is the closed-form family set (SpatialOps), so parsing
  * maps CF grid-mapping parameters onto a REGISTERED family and declines
  * loudly otherwise — same discipline as the reprojection dispatcher.
  */
object CfGridMapping {

  /** One variable's metadata (+ values when dimension-sized): the
    * CF-relevant view of a dataset, source-format agnostic. `data` is
    * None for data variables — only 1-D coordinate candidates need
    * values, and those are dimension-sized by construction. */
  final case class CfVar(name: String, dims: Seq[String],
                         attrs: Map[String, String],
                         data: Option[Array[Double]] = None)

  // ------------------------------------------------------------------
  // CF attrs <-> registered CRS strings
  // ------------------------------------------------------------------

  private def num(attrs: Map[String, String], k: String): Option[Double] =
    attrs.get(k).flatMap(_.trim.toDoubleOption)

  private def nums(attrs: Map[String, String], k: String): Seq[Double] =
    attrs.get(k).toSeq.flatMap(_.split(',').flatMap(_.trim.toDoubleOption))

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol

  /** The registered CRS string encoded by a CF grid-mapping variable's
    * attributes, or None when the attributes carry no CRS at all.
    * RECOGNIZED-but-unregistered parameter combinations (an LCC with
    * unknown parallels, a UTM with a non-standard scale factor) throw —
    * silently falling back to geographic would misplace every pixel. */
  def crsFromCf(attrs: Map[String, String]): Option[String] = {
    def bad(name: String, detail: String): Nothing =
      throw new IllegalArgumentException(
        s"CF grid_mapping_name '$name' with $detail does not match a " +
          "registered CRS family (SpatialOps' closed-form set) — " +
          "re-project the source, or register the family first")
    // false offsets: STRICT when present (a shifted variant must not
    // silently match a registered code — it would displace every pixel
    // by the offset), lenient when absent (plenty of CF granules omit
    // the attributes for zero-offset grids)
    def feOk(name: String, fe0: Double, fn0: Double): Unit = {
      val fe = num(attrs, "false_easting")
      val fn = num(attrs, "false_northing")
      if (!(fe.forall(close(_, fe0)) && fn.forall(close(_, fn0))))
        bad(name, s"false offsets ($fe, $fn) that differ from the " +
          s"registered ($fe0, $fn0)")
    }
    // ellipsoid: families whose registered code pins a specific figure
    // must not silently absorb a granule declaring a DIFFERENT one (a
    // code-less ED50 / UTM 33 would otherwise resolve to the WGS84
    // EPSG:32633, ~100-200 m off). GRS80 passes the WGS84 tolerance
    // (Δ1/f = 1.5e-6 → sub-mm at these families' scales); lenient when
    // absent, like feOk.
    def ellOk(name: String, a0: Double = 6378137.0,
              invF0: Double = 298.257223563): Unit = {
      val aE = num(attrs, "semi_major_axis")
        .orElse(num(attrs, "earth_radius"))
      val invF = num(attrs, "inverse_flattening")
      if (aE.exists(v => !close(v, a0, 0.5)) ||
        invF.exists(v => !close(v, invF0, 1e-3)))
        bad(name, s"an ellipsoid (a=$aE, 1/f=$invF) that differs from " +
          s"the registered one (a=$a0, 1/f=$invF0)")
    }
    attrs.get("grid_mapping_name").map(_.trim) match {
      case Some("latitude_longitude") => Some("CRS84")
      case Some(n @ "rotated_latitude_longitude") =>
        (num(attrs, "grid_north_pole_latitude"),
          num(attrs, "grid_north_pole_longitude")) match {
          case (Some(la), Some(lo)) => Some(s"ROTPOLE:$la:$lo")
          case _ => bad(n, "missing grid_north_pole_latitude/longitude")
        }
      case Some(n @ "transverse_mercator") =>
        val cm = num(attrs, "longitude_of_central_meridian")
          .getOrElse(bad(n, "no longitude_of_central_meridian"))
        val k0 = num(attrs, "scale_factor_at_central_meridian")
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        val lat0 = num(attrs, "latitude_of_projection_origin").getOrElse(0.0)
        val aM = num(attrs, "semi_major_axis")
        val invF = num(attrs, "inverse_flattening")
        // registered national grids on their own ellipsoids first
        // (PolarOps.Tmerc, EPSG method 9807) — the hotineForCrs pattern
        def isTm(tm: PolarOps.Tmerc): Boolean =
          close(lat0, tm.lat0Deg) && close(cm, tm.lon0Deg) &&
            k0.forall(close(_, tm.k0, 1e-9)) &&
            close(fe, tm.x0) && close(fn, tm.y0) &&
            aM.forall(close(_, tm.a, 0.5)) &&
            invF.forall(close(_, tm.invF, 1e-4))
        val zone = math.round((cm + 183.0) / 6.0).toInt
        val isUtm = k0.forall(close(_, UtmOps.K0, 1e-9)) &&
          close(fe, UtmOps.FalseEasting) && close(lat0, 0.0) &&
          zone >= 1 && zone <= 60 && close(cm, zone * 6.0 - 183.0) &&
          (close(fn, 0.0) || close(fn, 1e7))
        if (isTm(PolarOps.tmercForCrs("EPSG:27700").get)) Some("EPSG:27700")
        else if (isTm(PolarOps.tmercForCrs("EPSG:31467").get))
          Some("EPSG:31467")
        else if (aM.exists(v => !close(v, 6378137.0, 0.5)) ||
          invF.exists(v => !close(v, 298.257223563, 1e-3)))
          bad(n, s"a non-WGS84 ellipsoid (a=$aM, 1/f=$invF) outside the " +
            "registered OSGB36 / DHDN Gauss-Kruger combinations")
        else if (isUtm) {
          if (close(fn, 0.0)) Some(f"EPSG:326$zone%02d")
          else Some(f"EPSG:327$zone%02d")
        } else
          // general WGS84 transverse Mercator (EPSG 9807 generic form;
          // the k0 default is the method's natural-origin 1.0)
          Some(s"TMERC:$lat0:$cm:${k0.getOrElse(1.0)}:$fe:$fn")
      case Some(n @ "polar_stereographic") =>
        val latTs = num(attrs, "standard_parallel")
          .orElse(num(attrs, "latitude_of_projection_origin"))
          .getOrElse(bad(n, "no standard_parallel"))
        val lon0 = num(attrs, "straight_vertical_longitude_from_pole")
          .orElse(num(attrs, "longitude_of_projection_origin"))
          .getOrElse(0.0)
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        ellOk(n)
        val k0ps = num(attrs, "scale_factor_at_projection_origin")
        val spGiven = num(attrs, "standard_parallel")
        // variant A (EPSG 9810, the UPS family): scale factor AT the
        // pole, no standard parallel; variant B (9829): standard
        // parallel, no scale factor. Both at once is contradictory.
        if (k0ps.exists(v => !close(v, 1.0)) &&
          spGiven.exists(v => math.abs(v) < 89.999))
          bad(n, "BOTH a standard parallel and a scale factor (EPSG " +
            "9829 / 9810 are either-or)")
        if (math.abs(latTs) >= 89.999) {
          // variant A: the latTs fallback read the ±90 projection origin
          val k0 = k0ps.getOrElse(1.0)
          val north = latTs > 0
          if (close(k0, 0.994) && close(lon0, 0.0) &&
            close(fe, 2000000.0) && close(fn, 2000000.0))
            Some(if (north) "EPSG:5041" else "EPSG:5042")
          else Some(s"PSA:${if (north) 90.0 else -90.0}:$k0:$lon0:$fe:$fn")
        } else if (k0ps.exists(v => !close(v, 1.0)))
          bad(n, s"a scale factor with a non-polar standard parallel " +
            s"$latTs (variant A places the natural origin at the pole)")
        else if (close(latTs, 70.0) && close(lon0, -45.0) && close(fe, 0.0) &&
          close(fn, 0.0)) Some("EPSG:3413")
        else if (close(latTs, -70.0) && close(lon0, 0.0) && close(fe, 0.0) &&
          close(fn, 0.0)) Some("EPSG:3976")
        else if (close(latTs, -71.0) && close(lon0, 0.0) && close(fe, 0.0) &&
          close(fn, 0.0)) Some("EPSG:3031")
        else Some(s"PS:$latTs:$lon0:$fe:$fn")
      case Some(n @ "stereographic") =>
        // CF `stereographic` denotes proj's EPSG 9810-family `stere`,
        // which agrees with the registered double stereographic (9809)
        // only at the origin — meters of divergence at country scale if
        // coerced (ADVICE r19). Decline loudly instead.
        bad(n, "the plain (9810-family) scale semantics — only the " +
          "double stereographic (grid_mapping_name oblique_stereographic," +
          " EPSG 9809) has a registered closed form here; the two agree " +
          "only at the origin")
      case Some(n @ "oblique_stereographic") =>
        // the EPSG 9809 double ("oblique") form — exact for the
        // registered Bessel RD New combination, WGS84 otherwise; polar
        // latitudes must use polar_stereographic (different closed form)
        val lat0 = num(attrs, "latitude_of_projection_origin")
          .getOrElse(bad(n, "no latitude_of_projection_origin"))
        if (math.abs(lat0) > 89.999)
          bad(n, "a polar origin (use polar_stereographic)")
        val lon0 = num(attrs, "longitude_of_projection_origin").getOrElse(0.0)
        val k0 = num(attrs, "scale_factor_at_projection_origin")
          .getOrElse(1.0)
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        val a = num(attrs, "semi_major_axis")
        val invF = num(attrs, "inverse_flattening")
        val isRd = close(lat0, 52.15616055555556, 1e-7) &&
          close(lon0, 5.38763888888889, 1e-7) &&
          close(k0, 0.9999079, 1e-9) &&
          close(fe, 155000.0) && close(fn, 463000.0) &&
          a.forall(close(_, 6377397.155, 0.5)) &&
          invF.forall(close(_, 299.1528128, 1e-4))
        if (isRd) Some("EPSG:28992")
        else if (a.exists(v => !close(v, 6378137.0, 0.5)) ||
          invF.exists(v => !close(v, 298.257223563, 1e-6)))
          bad(n, s"a non-WGS84 ellipsoid (a=$a, 1/f=$invF) outside the " +
            "registered RD New combination")
        else Some(s"STEREO:$lat0:$lon0:$k0:$fe:$fn")
      case Some(n @ "oblique_mercator") =>
        // CF oblique_mercator == the Hotine family (EPSG 9812/9815).
        // CF has no rectified-grid-angle attribute; the WKT1 name
        // rides through as an extension, defaulting to the azimuth
        // (the proj +gamma default)
        val latc = num(attrs, "latitude_of_projection_origin")
          .getOrElse(bad(n, "no latitude_of_projection_origin"))
        val lonc = num(attrs, "longitude_of_projection_origin")
          .getOrElse(bad(n, "no longitude_of_projection_origin"))
        val alpha = num(attrs, "azimuth_of_central_line")
          .getOrElse(bad(n, "no azimuth_of_central_line"))
        val gamma = num(attrs, "rectified_grid_angle").getOrElse(alpha)
        val k0 = num(attrs, "scale_factor_at_projection_origin")
          .getOrElse(1.0)
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        val aM = num(attrs, "semi_major_axis")
        val invF = num(attrs, "inverse_flattening")
        val variantA = attrs.get("no_uoff").isDefined
        def isHom(hm: PolarOps.HotineOm): Boolean =
          close(latc, hm.latcDeg, 1e-7) && close(lonc, hm.loncDeg, 1e-7) &&
            close(alpha, hm.alphaDeg, 1e-7) &&
            close(gamma, hm.gammaDeg, 1e-7) && close(k0, hm.k0, 1e-9) &&
            close(fe, hm.x0) && close(fn, hm.y0) &&
            aM.forall(close(_, hm.a, 0.5)) &&
            invF.forall(close(_, hm.invF, 1e-4))
        if (!variantA && isHom(PolarOps.hotineForCrs("EPSG:29873").get))
          Some("EPSG:29873")
        else if (!variantA && isHom(PolarOps.hotineForCrs("EPSG:2056").get))
          Some("EPSG:2056")
        else if (aM.exists(v => !close(v, 6378137.0, 0.5)) ||
          invF.exists(v => !close(v, 298.257223563, 1e-6)))
          bad(n, s"a non-WGS84 ellipsoid (a=$aM, 1/f=$invF) outside the " +
            "registered RSO-Borneo / LV95 combinations")
        else Some(s"HOM:$latc:$lonc:$alpha:$gamma:$k0:$fe:$fn" +
          (if (variantA) ":A" else ""))
      case Some(n @ "lambert_azimuthal_equal_area") =>
        val lat0 = num(attrs, "latitude_of_projection_origin")
          .getOrElse(bad(n, "no latitude_of_projection_origin"))
        val lon0 = num(attrs, "longitude_of_projection_origin").getOrElse(0.0)
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        ellOk(n)
        if (close(lat0, 52.0) && close(lon0, 10.0) &&
          close(fe, 4321000.0) && close(fn, 3210000.0)) Some("EPSG:3035")
        else if (close(lat0, 90.0) && close(lon0, 0.0) && close(fe, 0.0) &&
          close(fn, 0.0)) Some("EPSG:6931")
        else if (close(lat0, -90.0) && close(lon0, 0.0) && close(fe, 0.0) &&
          close(fn, 0.0)) Some("EPSG:6932")
        else Some(s"LAEA:$lat0:$lon0:$fe:$fn") // generic WGS84 form (r20)
      case Some(n @ "lambert_conformal_conic") =>
        val sp = nums(attrs, "standard_parallel")
        val lat0 = num(attrs, "latitude_of_projection_origin").getOrElse(0.0)
        val lon0 = num(attrs, "longitude_of_central_meridian")
          .orElse(num(attrs, "longitude_of_projection_origin"))
          .getOrElse(bad(n, "no central meridian"))
        def spIs(a: Double, b: Double): Boolean = sp.length == 2 &&
          ((close(sp(0), a) && close(sp(1), b)) ||
            (close(sp(0), b) && close(sp(1), a)))
        ellOk(n)
        val lccFe = num(attrs, "false_easting").getOrElse(0.0)
        val lccFn = num(attrs, "false_northing").getOrElse(0.0)
        if (spIs(49.0, 44.0) && close(lat0, 46.5) && close(lon0, 3.0) &&
          close(lccFe, 700000.0) && close(lccFn, 6600000.0))
          Some("EPSG:2154")
        else if (spIs(49.0, 77.0) && close(lat0, 49.0) &&
          close(lon0, -95.0) && close(lccFe, 0.0) && close(lccFn, 0.0))
          Some("EPSG:3978")
        else if (sp.length == 2)
          // generic WGS84/GRS80 2SP form (r20; a 1SP granule still
          // declines below — different EPSG method, 9801)
          Some(s"LCC:${sp(0)}:${sp(1)}:$lat0:$lon0:$lccFe:$lccFn")
        else bad(n, s"parallels $sp (the 1SP form, EPSG 9801, has no " +
          "registered closed form)")
      case Some(n @ "albers_conical_equal_area") =>
        val sp = nums(attrs, "standard_parallel")
        val lat0 = num(attrs, "latitude_of_projection_origin").getOrElse(0.0)
        val lon0 = num(attrs, "longitude_of_central_meridian").getOrElse(0.0)
        ellOk(n)
        val abFe = num(attrs, "false_easting").getOrElse(0.0)
        val abFn = num(attrs, "false_northing").getOrElse(0.0)
        if (sp.length == 2 && close(sp.min, 29.5) && close(sp.max, 45.5) &&
          close(lat0, 23.0) && close(lon0, -96.0) && close(abFe, 0.0) &&
          close(abFn, 0.0))
          Some("EPSG:5070")
        else if (sp.length == 2)
          // generic WGS84/GRS80 2SP form (r20)
          Some(s"ALBERS:${sp(0)}:${sp(1)}:$lat0:$lon0:$abFe:$abFn")
        else bad(n, s"parallels $sp (2SP required)")
      case Some(n @ "lambert_cylindrical_equal_area") =>
        val lat = num(attrs, "standard_parallel")
          .getOrElse(bad(n, "no standard_parallel"))
        val lon0 = num(attrs, "longitude_of_central_meridian").getOrElse(0.0)
        ellOk(n)
        if (close(math.abs(lat), 30.0) && close(lon0, 0.0)) {
          feOk(n, 0.0, 0.0)
          Some("EPSG:6933") // EASE-Grid 2.0 global
        } else bad(n, s"standard_parallel $lat, central meridian $lon0")
      case Some(n @ "orthographic") =>
        (num(attrs, "latitude_of_projection_origin"),
          num(attrs, "longitude_of_projection_origin")) match {
          case (Some(la), Some(lo)) => Some(s"ORTHO:$la:$lo")
          case _ => bad(n, "missing projection origin")
        }
      case Some(n @ "mollweide") =>
        Some(s"MOLL:${num(attrs, "longitude_of_projection_origin")
          .orElse(num(attrs, "longitude_of_central_meridian"))
          .getOrElse(bad(n, "no projection origin"))}")
      case Some(n @ "sinusoidal") =>
        // the registered MODIS grid is Greenwich-centered, zero-offset —
        // a shifted sinusoidal would misplace every pixel silently
        val sinuLon0 = num(attrs, "longitude_of_projection_origin")
          .orElse(num(attrs, "longitude_of_central_meridian"))
          .getOrElse(0.0)
        if (!close(sinuLon0, 0.0))
          bad(n, s"central meridian $sinuLon0 (the registered MODIS " +
            "grid is Greenwich-centered)")
        feOk(n, 0.0, 0.0)
        ellOk(n, 6371007.181, 0.0) // the MODIS sphere (rf declared as 0)
        Some("SR-ORG:6974")
      case Some("equal_earth") =>
        // not (yet) a CF-standard name; pyproj/rioxarray reach Equal
        // Earth via crs_wkt — this is the write-side round-trip name
        val lon0 = num(attrs, "longitude_of_projection_origin")
          .orElse(num(attrs, "longitude_of_central_meridian"))
          .getOrElse(0.0)
        feOk("equal_earth", 0.0, 0.0)
        ellOk("equal_earth")
        if (close(lon0, 0.0)) Some("EPSG:8857") else Some(s"EQEARTH:$lon0")
      case Some(n @ "popular_visualisation_pseudo_mercator") =>
        feOk(n, 0.0, 0.0)
        // EPSG method 1024 is SPHERICAL on the WGS84 semi-major axis:
        // only the radius matters (a declared flattening — 0 for an
        // explicit sphere, 298.26 from the datum — is ignored by the
        // method), but a DIFFERENT radius scales every coordinate
        if (num(attrs, "semi_major_axis")
          .orElse(num(attrs, "earth_radius"))
          .exists(v => !close(v, 6378137.0, 0.5)))
          bad(n, "a sphere radius that differs from the registered " +
            "6378137 m web-mercator radius")
        Some("EPSG:3857")
      case Some(n @ "mercator") =>
        // CF mercator carries EITHER standard_parallel (EPSG 9805,
        // variant B) OR scale_factor_at_projection_origin (9804,
        // variant A). The ellipsoid attrs decide spherical-vs-
        // ellipsoidal: an explicit inverse_flattening is the EPSG:3395
        // family (PolarOps.Merc closed iso-latitude forms); no
        // ellipsoid attrs + SP=0/k0=1/lon0=0 is the spherical
        // web-mercator. Coercing either into the other misplaces y by
        // ~21 km at 60 deg.
        val sp = num(attrs, "standard_parallel")
        val k0 = num(attrs, "scale_factor_at_projection_origin")
        val lon0 = num(attrs, "longitude_of_projection_origin")
          .orElse(num(attrs, "longitude_of_central_meridian"))
          .getOrElse(0.0)
        val lat0 = num(attrs, "latitude_of_projection_origin").getOrElse(0.0)
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        val aM = num(attrs, "semi_major_axis")
        val invF = num(attrs, "inverse_flattening")
        if (!close(lat0, 0.0))
          bad(n, s"latitude_of_projection_origin $lat0 (EPSG 9804/9805 " +
            "place the natural origin on the equator)")
        if (sp.exists(v => !close(v, 0.0)) && k0.exists(v => !close(v, 1.0)))
          bad(n, "BOTH a standard parallel and a scale factor (EPSG " +
            "9804/9805 are either-or)")
        // registered non-WGS84 combinations (per-CRS ellipsoids) first
        def isM(code: String): Boolean = {
          val m = PolarOps.mercForCrs(code).get
          close(lon0, m.lon0Deg) && close(fe, m.x0) && close(fn, m.y0) &&
            (if (m.variantB) sp.exists(close(_, m.lat1Deg)) &&
              k0.forall(close(_, 1.0))
            else k0.exists(close(_, m.k0, 1e-9)) &&
              sp.forall(close(_, 0.0))) &&
            aM.forall(close(_, m.a, 0.5)) &&
            invF.forall(close(_, m.invF, 1e-4))
        }
        if (isM("EPSG:3002")) Some("EPSG:3002")
        else if (isM("EPSG:3388")) Some("EPSG:3388")
        else if (aM.exists(v => !close(v, 6378137.0, 0.5)) ||
          invF.exists(v => v > 0.0 && !close(v, 298.257223563, 1e-3)))
          bad(n, s"a non-WGS84 ellipsoid (a=$aM, 1/f=$invF) outside the " +
            "registered Makassar / Caspian Sea combinations")
        else if (invF.exists(_ > 0.0)) {
          // WGS84 ellipsoidal — the EPSG:3395 family
          if (sp.forall(close(_, 0.0)) && k0.forall(close(_, 1.0)) &&
            close(lon0, 0.0) && close(fe, 0.0) && close(fn, 0.0))
            Some("EPSG:3395")
          else sp match {
            case Some(p) if !close(p, 0.0) =>
              Some(s"MERCSP:$lon0:$p:$fe:$fn")
            case _ => Some(s"MERC:$lon0:${k0.getOrElse(1.0)}:$fe:$fn")
          }
        } else {
          // no ellipsoid declared: only the spherical web-mercator case
          // is unambiguous; anything else could mean a sphere OR the
          // EPSG:3395 family (pyproj builds an undefined-datum CRS that
          // fails at transform time — decline at open instead)
          if (sp.forall(close(_, 0.0)) && k0.forall(close(_, 1.0)) &&
            close(lon0, 0.0)) {
            feOk(n, 0.0, 0.0)
            Some("EPSG:3857")
          } else
            bad(n, s"standard_parallel=$sp scale_factor=$k0 lon0=$lon0 " +
              "but NO ellipsoid attrs — ambiguous between the spherical " +
              "and EPSG:3395 (9804/9805) forms; declare " +
              "semi_major_axis/inverse_flattening")
        }
      case Some(n @ ("equirectangular" | "equidistant_cylindrical")) =>
        // equidistant cylindrical in meters (EPSG method 1028, the
        // EPSG:4087 / plate-carree-in-meters family). Not a CF-standard
        // name; the write-side round-trip name, like equal_earth.
        val sp = num(attrs, "standard_parallel").getOrElse(0.0)
        val lon0 = num(attrs, "longitude_of_central_meridian")
          .orElse(num(attrs, "longitude_of_projection_origin"))
          .getOrElse(0.0)
        val lat0 = num(attrs, "latitude_of_projection_origin").getOrElse(0.0)
        val fe = num(attrs, "false_easting").getOrElse(0.0)
        val fn = num(attrs, "false_northing").getOrElse(0.0)
        if (!close(lat0, 0.0))
          bad(n, s"latitude_of_projection_origin $lat0 (EPSG 1028 has " +
            "no latitude-of-origin shift)")
        ellOk(n)
        if (close(sp, 0.0) && close(lon0, 0.0) && close(fe, 0.0) &&
          close(fn, 0.0)) Some("EPSG:4087")
        else Some(s"EQC:$sp:$lon0:$fe:$fn")
      case Some(n @ "geostationary") =>
        val lon0 = num(attrs, "longitude_of_projection_origin")
          .getOrElse(bad(n, "no longitude_of_projection_origin"))
        val h = num(attrs, "perspective_point_height")
          .getOrElse(bad(n, "no perspective_point_height"))
        val sweep = attrs.get("sweep_angle_axis").map(_.trim)
          // CF offers either axis attribute; they are each other's
          // complement in the {x, y} pair
          .orElse(attrs.get("fixed_angle_axis").map(_.trim).collect {
            case "x" => "y"
            case "y" => "x"
          })
          .getOrElse("y") // CF default sweep_angle_axis is "y" (MSG)
        if (sweep != "x" && sweep != "y") bad(n, s"sweep axis '$sweep'")
        feOk(n, 0.0, 0.0)
        ellOk(n) // GRS80 (the GOES-R figure) passes the WGS84 tolerance
        Some(s"GEOS:$lon0:$h:$sweep")
      case Some(other) =>
        bad(other, "a family this library has no closed form for")
      case None =>
        // WKT fallback (rioxarray-style spatial_ref / CF crs_wkt), the
        // pyproj.CRS.from_wkt analog, in two tiers:
        //  1. the LAST EPSG authority code in the document, when that
        //     code is itself a registered CRS;
        //  2. else a STRUCTURAL parse — PROJECTION/METHOD + PARAMETER
        //     clauses translated to CF attributes and matched against
        //     the same registry (so a Lambert-93 granule shipping only
        //     a code-less WKT resolves exactly like the CF-attrs route,
        //     and an unregistered projection declines loudly instead of
        //     silently reading as geographic).
        attrs.get("crs_wkt").orElse(attrs.get("spatial_ref")).flatMap {
          wkt =>
            val ids =
              """(?:AUTHORITY|ID)\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]""".r
                .findAllMatchIn(wkt).map(_.group(1)).toSeq
            val byId = ids.lastOption.map {
              case "4326" => "CRS84"
              case code => s"EPSG:$code"
            }
            byId.filter(c => scala.util.Try(cfAttrs(c)).isSuccess)
              .orElse(WktCrs.toCfAttrs(wkt)
                .orElse(WktCrs.projToCfAttrs(wkt)) match {
                case Some(cf) => crsFromCf(cf)
                case None => byId // neither WKT nor proj: keep the raw id
              })
        }
    }
  }

  /** The CF attributes describing one of our registered CRS strings —
    * the write-side complement of [[crsFromCf]] (round-trips through it
    * for every registered family). */
  def cfAttrs(crs: String): Map[String, String] = {
    if (graft.operators.SpatialOps.isGeographic(crs))
      return Map("grid_mapping_name" -> "latitude_longitude")
    if (crs == "EPSG:3857")
      return Map("grid_mapping_name" -> "mercator",
        "standard_parallel" -> "0.0")
    UtmOps.zoneForCrs(crs).map { z =>
      Map("grid_mapping_name" -> "transverse_mercator",
        "longitude_of_central_meridian" -> (z.zone * 6.0 - 183.0).toString,
        "latitude_of_projection_origin" -> "0.0",
        "scale_factor_at_central_meridian" -> UtmOps.K0.toString,
        "false_easting" -> UtmOps.FalseEasting.toString,
        "false_northing" -> z.falseNorthing.toString)
    }.orElse(PolarOps.stereoForCrs(crs).map { ps =>
      Map("grid_mapping_name" -> "polar_stereographic",
        "straight_vertical_longitude_from_pole" -> ps.lon0.toString,
        "latitude_of_projection_origin" -> (if (ps.north) "90.0" else "-90.0"),
        "false_easting" -> ps.x0.toString,
        "false_northing" -> ps.y0.toString) ++
        // variant A writes the pole scale factor, variant B the
        // standard parallel — the same either-or the read side enforces
        (if (ps.k0.isNaN) Map("standard_parallel" -> ps.latTs.toString)
        else Map("scale_factor_at_projection_origin" -> ps.k0.toString))
    }).orElse(PolarOps.laeaForCrs(crs).map { la =>
      Map("grid_mapping_name" -> "lambert_azimuthal_equal_area",
        "latitude_of_projection_origin" -> la.lat0.toString,
        "longitude_of_projection_origin" -> la.lon0.toString,
        "false_easting" -> la.x0.toString, "false_northing" -> la.y0.toString)
    }).orElse(PolarOps.lccForCrs(crs).map { lc =>
      Map("grid_mapping_name" -> "lambert_conformal_conic",
        "standard_parallel" -> s"${lc.lat1},${lc.lat2}",
        "latitude_of_projection_origin" -> lc.lat0.toString,
        "longitude_of_central_meridian" -> lc.lon0.toString,
        "false_easting" -> lc.x0.toString, "false_northing" -> lc.y0.toString)
    }).orElse(PolarOps.albersForCrs(crs).map { ab =>
      Map("grid_mapping_name" -> "albers_conical_equal_area",
        "standard_parallel" -> s"${ab.lat1},${ab.lat2}",
        "latitude_of_projection_origin" -> ab.lat0.toString,
        "longitude_of_central_meridian" -> ab.lon0.toString,
        "false_easting" -> ab.x0.toString, "false_northing" -> ab.y0.toString)
    }).orElse(PolarOps.rotPoleForCrs(crs).map { rp =>
      Map("grid_mapping_name" -> "rotated_latitude_longitude",
        "grid_north_pole_latitude" -> rp.poleLatDeg.toString,
        "grid_north_pole_longitude" -> rp.poleLonDeg.toString)
    }).orElse(
      if (PolarOps.isEase2(crs))
        Some(Map("grid_mapping_name" -> "lambert_cylindrical_equal_area",
          "standard_parallel" -> PolarOps.Ease2LatTs.toString,
          "longitude_of_central_meridian" -> "0.0",
          "false_easting" -> "0.0", "false_northing" -> "0.0"))
      else None
    ).orElse(PolarOps.orthoForCrs(crs).map { o =>
      Map("grid_mapping_name" -> "orthographic",
        "latitude_of_projection_origin" -> o.lat0Deg.toString,
        "longitude_of_projection_origin" -> o.lon0Deg.toString,
        "false_easting" -> "0.0", "false_northing" -> "0.0")
    }).orElse(PolarOps.mollForCrs(crs).map { mw =>
      Map("grid_mapping_name" -> "mollweide",
        "longitude_of_projection_origin" -> mw.lon0Deg.toString,
        "false_easting" -> "0.0", "false_northing" -> "0.0")
    }).orElse(PolarOps.hotineForCrs(crs).map { hm =>
      Map("grid_mapping_name" -> "oblique_mercator",
        "latitude_of_projection_origin" -> hm.latcDeg.toString,
        "longitude_of_projection_origin" -> hm.loncDeg.toString,
        "azimuth_of_central_line" -> hm.alphaDeg.toString,
        "rectified_grid_angle" -> hm.gammaDeg.toString,
        "scale_factor_at_projection_origin" -> hm.k0.toString,
        "false_easting" -> hm.x0.toString,
        "false_northing" -> hm.y0.toString) ++
        (if (math.abs(hm.invF - 298.257223563) > 1e-6)
          Map("semi_major_axis" -> hm.a.toString,
            "inverse_flattening" -> hm.invF.toString)
        else Map.empty) ++
        (if (hm.variantB) Map.empty else Map("no_uoff" -> "true"))
    }).orElse(PolarOps.eqEarthForCrs(crs).map { ee =>
      Map("grid_mapping_name" -> "equal_earth",
        "longitude_of_projection_origin" -> ee.lon0Deg.toString,
        "false_easting" -> "0.0", "false_northing" -> "0.0")
    }).orElse(PolarOps.obliqueStereoForCrs(crs).map { os =>
      Map("grid_mapping_name" -> "oblique_stereographic",
        "latitude_of_projection_origin" -> os.lat0Deg.toString,
        "longitude_of_projection_origin" -> os.lon0Deg.toString,
        "scale_factor_at_projection_origin" -> os.k0.toString,
        "false_easting" -> os.x0.toString,
        "false_northing" -> os.y0.toString) ++
        (if (math.abs(os.invF - 298.257223563) > 1e-6)
          Map("semi_major_axis" -> os.a.toString,
            "inverse_flattening" -> os.invF.toString)
        else Map.empty)
    }).orElse(PolarOps.geosForCrs(crs).map { g =>
      Map("grid_mapping_name" -> "geostationary",
        "longitude_of_projection_origin" -> g.lon0Deg.toString,
        "perspective_point_height" -> g.h.toString,
        "sweep_angle_axis" -> (if (g.sweepX) "x" else "y"),
        "false_easting" -> "0.0", "false_northing" -> "0.0")
    }).orElse(
      if (PolarOps.isSinusoidal(crs))
        Some(Map("grid_mapping_name" -> "sinusoidal",
          "longitude_of_projection_origin" -> "0.0",
          "earth_radius" -> "6371007.181"))
      else None
    ).orElse(PolarOps.mercForCrs(crs).map { mc =>
      // ellipsoid attrs ALWAYS: their presence is what distinguishes the
      // 9804/9805 ellipsoidal family from the spherical web-mercator on
      // the read side (crsFromCf's mercator branch)
      Map("grid_mapping_name" -> "mercator",
        "longitude_of_projection_origin" -> mc.lon0Deg.toString,
        "false_easting" -> mc.x0.toString,
        "false_northing" -> mc.y0.toString,
        "semi_major_axis" -> mc.a.toString,
        "inverse_flattening" -> mc.invF.toString) ++
        (if (mc.variantB) Map("standard_parallel" -> mc.lat1Deg.toString)
        else Map("scale_factor_at_projection_origin" -> mc.k0In.toString))
    }).orElse(PolarOps.eqcForCrs(crs).map { q =>
      Map("grid_mapping_name" -> "equirectangular",
        "standard_parallel" -> q.lat1Deg.toString,
        "longitude_of_central_meridian" -> q.lon0Deg.toString,
        "false_easting" -> q.x0.toString,
        "false_northing" -> q.y0.toString)
    }).orElse(PolarOps.tmercForCrs(crs).map { tm =>
      Map("grid_mapping_name" -> "transverse_mercator",
        "latitude_of_projection_origin" -> tm.lat0Deg.toString,
        "longitude_of_central_meridian" -> tm.lon0Deg.toString,
        "scale_factor_at_central_meridian" -> tm.k0.toString,
        "false_easting" -> tm.x0.toString,
        "false_northing" -> tm.y0.toString) ++
        (if (math.abs(tm.invF - 298.257223563) > 1e-6)
          Map("semi_major_axis" -> tm.a.toString,
            "inverse_flattening" -> tm.invF.toString)
        else Map.empty)
    }).getOrElse(throw new IllegalArgumentException(
      s"no CF grid-mapping emission for CRS '$crs' — register the " +
        "family in SpatialOps + cfAttrs first"))
  }

  // ------------------------------------------------------------------
  // round_to_fraction (reference helpers.py:137-190)
  // ------------------------------------------------------------------

  private val Resolutions: Map[Int, (Double, Int)] = Map(
    10 -> (0.1, 1), 20 -> (0.2, 1), 25 -> (0.25, 2), 50 -> (0.5, 1),
    100 -> (1.0, 0))

  /** Round `value` at the position given by `digits` significant digits
    * with the least-significant digit snapped to `resolution` — the
    * reference's coordinate-delta cleanup (a 0.04999999-degree step
    * reads back as 0.05). */
  def roundToFraction(value: Double, digits: Int = 2,
                      resolution: Double = 1.0): Double = {
    require(digits >= 1, "digits must be a positive integer")
    val key = math.round(100 * resolution).toInt
    require(Resolutions.contains(key) && close(100 * resolution, key.toDouble),
      s"resolution must be one of 0.1, 0.2, 0.25, 0.5, 1 — got $resolution")
    if (value == 0.0) return 0.0
    val sign = if (value < 0) -1.0 else 1.0
    val v = math.abs(value)
    val (res, resDigits) = Resolutions(key)
    val exponent = math.floor(math.log10(v)).toInt - digits - resDigits
    val scale = math.pow(10.0, exponent)
    sign * math.rint(v / scale / (res * 100)) * (res * 100) * scale
  }

  // ------------------------------------------------------------------
  // from_coords: 1-D coordinate arrays -> grid + regularity
  // ------------------------------------------------------------------

  /** A grid derived from coordinates: the mapping plus whether the
    * source deltas were uniform within tolerance, plus the TRUE bbox
    * maxima (last coordinate + res/2 — reference coords.py:292-302).
    * An irregular `gm`'s own xMax/yMax are synthetic (xMin + count·res
    * with a median-estimated res), so [[toRegular]] must size the
    * covering grid from the true extremes, not from them (reference
    * regular.py `to_regular_grid_mapping` works off xy_bbox). */
  final case class CoordsMapping(gm: GridMapping, isRegular: Boolean,
                                 xMaxTrue: Double, yMaxTrue: Double) {
    def toRegular: GridMapping =
      if (isRegular) gm
      else {
        val res0 = math.min(gm.xRes, gm.yRes)
        val res = if (res0 > 0) res0 else math.max(gm.xRes, gm.yRes)
        val width = math.max(2L,
          math.round((xMaxTrue - gm.xMin + res) / res))
        val height = math.max(2L,
          math.round((yMaxTrue - gm.yMin + res) / res))
        gm.copy(width = width, height = height, xRes = res, yRes = res)
      }
  }

  /** `GridMapping.from_coords` for 1-D coordinates (reference
    * coords.py:115-160): resolution from the first delta, regularity =
    * every delta within `tolerance` of it, inverted y (image-order
    * rows) when the y values descend. The coordinate values are pixel
    * CENTERS, so the bbox extends half a resolution beyond them. */
  def fromCoords(xs0: Array[Double], ys: Array[Double], crs: String,
                 tolerance: Double = 1e-5): CoordsMapping = {
    require(xs0.length >= 2 && ys.length >= 2,
      "x and y coordinate arrays must hold at least 2 values")
    require(tolerance > 0.0, "tolerance must be greater than zero")
    def deltas(a: Array[Double]): Array[Double] =
      a.sliding(2).map(p => math.abs(p(1) - p(0))).toArray
    // geographic anti-meridian crossing (reference coords.py:128-135):
    // a raw delta > 180 degrees means the longitudes wrap at +-180 — normalize
    // to the lon-360 frame (the reference's to_lon_360) so the grid
    // derives contiguously; the mapping's xMin then lives in [0, 360)
    val xs =
      if (graft.operators.SpatialOps.isGeographic(crs) &&
        deltas(xs0).exists(_ > 180.0))
        xs0.map(x => if (x < 0) x + 360.0 else x)
      else xs0
    def median(a: Array[Double]): Double = {
      val s = a.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val dx = deltas(xs)
    val dy = deltas(ys)
    require(dx.forall(_ > 0.0) && dy.forall(_ > 0.0),
      "coordinate values must be strictly monotone (no repeated steps)")
    val regular =
      dx.forall(d => math.abs(d - dx(0)) <= tolerance) &&
        dy.forall(d => math.abs(d - dy(0)) <= tolerance)
    val (xRes, yRes) =
      if (regular)
        (roundToFraction(dx(0), 5, 0.25), roundToFraction(dy(0), 5, 0.25))
      else
        (roundToFraction(median(dx), 2, 0.5),
          roundToFraction(median(dy), 2, 0.5))
    val yDown = ys.head > ys.last
    val gm = GridMapping(
      width = xs.length.toLong, height = ys.length.toLong,
      xMin = xs.min - xRes / 2, yMin = ys.min - yRes / 2,
      xRes = xRes, yRes = yRes, crs = crs, yDown = yDown)
    CoordsMapping(gm, regular,
      xMaxTrue = xs.max + xRes / 2, yMaxTrue = ys.max + yRes / 2)
  }

  // ------------------------------------------------------------------
  // from_dataset: CF metadata search (cfconv.py)
  // ------------------------------------------------------------------

  private val XStandardNames =
    Map("longitude" -> 0, "grid_longitude" -> 1, "projection_x_coordinate" -> 2)
  private val YStandardNames =
    Map("latitude" -> 0, "grid_latitude" -> 1, "projection_y_coordinate" -> 2)
  private val XCommonNames = Seq(
    Seq("lon", "longitude"), Seq("rlon", "rlongitude"),
    Seq("x", "xc", "transformed_x"))
  private val YCommonNames = Seq(
    Seq("lat", "latitude"), Seq("rlat", "rlatitude"),
    Seq("y", "yc", "transformed_y"))

  /** `GridMapping.from_dataset` over a source-agnostic variable list:
    * find the CRS (grid-mapping variable referenced by a `grid_mapping`
    * attribute, else CRS attributes on any variable), find the 1-D x/y
    * coordinate variables (CF `standard_name` first, common names
    * second, family-matched to the CRS like cfconv.py:152-176), then
    * [[fromCoords]]. Geographic coords with NO CRS variable default to
    * CRS84 — the reference's `missing_latitude_longitude_crs`. */
  def fromVars(vars: Seq[CfVar], tolerance: Double = 1e-5,
               datasetAttrs: Map[String, String] = Map.empty)
      : CoordsMapping = {
    val byName = vars.map(v => v.name -> v).toMap
    // 1. grid-mapping variable referenced by any variable
    val referenced = vars.flatMap(_.attrs.get("grid_mapping"))
      .flatMap(byName.get).headOption
    // 2. else any variable carrying CRS attributes itself
    val crsVar = referenced.orElse(
      vars.find(v => crsFromCf(v.attrs).isDefined))
    // 3. else the DATASET attributes (cfconv.py:99-104 — the route
    // [[attachToZarr]] writes, and what rioxarray-style group attrs use)
    val dsCrs =
      if (crsVar.isDefined) None else crsFromCf(datasetAttrs)
    val crs = crsVar.flatMap(v => crsFromCf(v.attrs)).orElse(dsCrs)
    val gmName = crsVar.flatMap(_.attrs.get("grid_mapping_name"))
      .orElse(dsCrs.flatMap(_ => datasetAttrs.get("grid_mapping_name")))
    // family index: 0 = geographic, 1 = rotated, 2 = projected
    val family = gmName match {
      case Some("latitude_longitude") => 0
      case Some("rotated_latitude_longitude") => 1
      case Some(_) => 2
      case None => crs match {
        case Some(c) if graft.operators.SpatialOps.isGeographic(c) => 0
        case Some(c) if c.startsWith("ROTPOLE:") => 1
        case Some(_) => 2
        case None => 0 // no CRS anywhere: geographic coords + CRS84
      }
    }
    val oneDim = vars.filter(v => v.dims.length == 1 && v.data.isDefined)
    def find(standard: Map[String, Int], common: Seq[Seq[String]])
        : Option[CfVar] =
      oneDim.find(v =>
          v.attrs.get("standard_name").exists(sn =>
            standard.get(sn.trim).contains(family)))
        .orElse(oneDim.find(v => common(family).contains(v.name)))
    val xVar = find(XStandardNames, XCommonNames)
    val yVar = find(YStandardNames, YCommonNames)
    (xVar, yVar) match {
      case (Some(xv), Some(yv))
          if xv.data.get.length >= 2 && yv.data.get.length >= 2 =>
        fromCoords(xv.data.get, yv.data.get,
          crs.getOrElse("CRS84"), tolerance)
      case _ => throw new IllegalArgumentException(
        "no CF grid mapping derivable: x/y coordinate variables not " +
          s"found (grid mapping ${gmName.orElse(crs).getOrElse("none")}; " +
          s"1-D candidates: ${oneDim.map(_.name).mkString(", ")})")
    }
  }

  /** [[fromVars]] over a Zarr v2 group: per-array `.zattrs` provide the
    * CF metadata, group-level attrs are the dataset-attrs fallback, and
    * coordinate VALUES load only for the 1-D arrays that are actual
    * coordinate candidates (CF standard_name or a common axis name) —
    * a large 1-D data variable is never pulled to the driver. */
  def fromZarr(groupDir: String, tolerance: Double = 1e-5): CoordsMapping = {
    import graft.sources.ZarrSource
    val standardNames = XStandardNames.keySet ++ YStandardNames.keySet
    val commonNames = (XCommonNames ++ YCommonNames).flatten.toSet
    val vars = ZarrSource.listArrays(groupDir).map { n =>
      val za = ZarrSource.openArray(s"$groupDir/$n")
      val attrs = ZarrSource.arrayAttrs(groupDir, n)
      val candidate = za.dims.length == 1 &&
        (commonNames.contains(n) ||
          attrs.get("standard_name").exists(sn =>
            standardNames.contains(sn.trim)))
      val data =
        if (candidate) Some(ZarrSource.readAll(s"$groupDir/$n", za))
        else None
      CfVar(n, za.dims, attrs, data)
    }
    fromVars(vars, tolerance, ZarrSource.arrayAttrs(groupDir, ""))
  }

  /** Attach CF CRS metadata to a written Zarr group — the write-side of
    * [[fromZarr]] (rioxarray `write_crs` analog): the grid-mapping
    * parameters land in the GROUP attributes (the dataset-attrs
    * discovery route) and each coordinate array gets its family's CF
    * `standard_name`, so discovery no longer depends on axis naming. */
  def attachToZarr(groupDir: String, crs: String,
                   xName: String, yName: String): Unit = {
    import graft.sources.ZarrSource
    ZarrSource.updateAttrs(groupDir, "", cfAttrs(crs))
    val (sx, sy) =
      if (graft.operators.SpatialOps.isGeographic(crs))
        ("longitude", "latitude")
      else if (crs.startsWith("ROTPOLE:"))
        ("grid_longitude", "grid_latitude")
      else ("projection_x_coordinate", "projection_y_coordinate")
    ZarrSource.updateAttrs(groupDir, xName, Map("standard_name" -> sx))
    ZarrSource.updateAttrs(groupDir, yName, Map("standard_name" -> sy))
  }

  /** [[fromVars]] over a parsed NetCDF file. */
  def fromNetcdf(nc: graft.sources.NetcdfSource.NcFile,
                 tolerance: Double = 1e-5): CoordsMapping = {
    val dimNames = nc.dims.map(_.name)
    fromVars(nc.vars.map { v =>
      val dims = v.dimIds.map(dimNames(_))
      CfVar(v.name, dims, v.attrs,
        if (dims.length == 1) Some(v.data) else None)
    }, tolerance)
  }

  // ------------------------------------------------------------------
  // from_coords for 2-D coordinate COLUMNS (the swath case)
  // ------------------------------------------------------------------

  /** Derive the covering REGULAR target grid from a frame carrying 2-D
    * coordinates — `from_coords(2-D) → to_regular` fused, Spark-first
    * (reference coords.py:163-260: per-cell neighbor deltas, the
    * area-based resolution estimate weighted 0.7·min + 0.3·max, then
    * regular.py's covering-grid formula). The neighbor deltas come from
    * two self equi-joins on the (j, i) pixel key — hash-partitioned,
    * never windowed, never collected: only the four aggregate scalars
    * (bbox, min/max cell area, the j-axis direction probe) reach the
    * driver. Rows with NaN coordinates drop out of both the bbox and
    * the area estimate like the reference's nan-guards. */
  def fromCoords2d(df: DataFrame, iCol: String, jCol: String,
                   xcCol: String, ycCol: String, crs: String): GridMapping =
    fromCoords2dImpl(df, iCol, jCol, xcCol, ycCol, crs, lon360 = false)

  private def fromCoords2dImpl(df: DataFrame, iCol: String, jCol: String,
                               xcCol: String, ycCol: String, crs: String,
                               lon360: Boolean): GridMapping = {
    val geographic = graft.operators.SpatialOps.isGeographic(crs)
    val er = 6371000.0 // the reference's _ER (coords.py:30)
    // second pass of the anti-meridian protocol (coords.py:186-192):
    // with wrapping detected below, longitudes normalize to lon-360 and
    // everything — bbox, deltas, the derived grid — re-derives there
    val xIn =
      if (lon360)
        when(col(xcCol) < 0, col(xcCol) + 360.0).otherwise(col(xcCol))
      else col(xcCol)
    val base = df.select(col(iCol).cast("long").as("__i"),
      col(jCol).cast("long").as("__j"),
      xIn.cast("double").as("__x"),
      col(ycCol).cast("double").as("__y"))
      .filter(!isnan(col("__x")) && !isnan(col("__y")))
    val ext = base.agg(
      min("__x"), max("__x"), min("__y"), max("__y"),
      min("__j"), max("__j")).head()
    require(!ext.isNullAt(0), "fromCoords2d: no valid coordinate cells")
    val (xMinC, xMaxC) = (ext.getDouble(0), ext.getDouble(1))
    val (yMinC, yMaxC) = (ext.getDouble(2), ext.getDouble(3))
    val (j0, j1) = (ext.getLong(4), ext.getLong(5))
    // neighbor deltas: i-direction and j-direction via two self-joins
    val ni = base.select(col("__i").as("__i2"), col("__j").as("__j2"),
      col("__x").as("__xi"), col("__y").as("__yi"))
    val nj = base.select(col("__i").as("__i3"), col("__j").as("__j3"),
      col("__x").as("__xj"), col("__y").as("__yj"))
    val both = base
      .join(ni, col("__j") === col("__j2") && col("__i") + 1 === col("__i2"))
      .join(nj, col("__i") === col("__i3") && col("__j") + 1 === col("__j3"))
    val xXd = col("__xi") - col("__x")
    val yXd = col("__yi") - col("__y")
    val xYd = col("__xj") - col("__x")
    val yYd = col("__yj") - col("__y")
    // per-cell edge lengths; geographic degrees convert to metres at the
    // cell's own latitude so the area estimate is distance-true
    val (xAbs0, yAbs0) = (sqrt(xXd * xXd + yXd * yXd),
      sqrt(xYd * xYd + yYd * yYd))
    val (xAbs, yAbs) =
      if (geographic)
        (radians(xAbs0) * lit(er) * cos(radians(col("__y"))),
          radians(yAbs0) * lit(er))
      else (xAbs0, yAbs0)
    val area = xAbs * yAbs
    val a = both.filter(area > 0.0)
      .agg(min(area).as("mn"), max(area).as("mx"),
        max(abs(xXd)).as("mxd"), max(abs(xYd)).as("myd")).head()
    require(!a.isNullAt(0),
      "fromCoords2d: fewer than 2x2 valid cells — no resolution derivable")
    // geographic anti-meridian crossing: a neighbor delta > 180 degrees
    // means the swath wraps at +-180 — re-derive in the lon-360 frame
    if (!lon360 && geographic &&
      (a.getDouble(2) > 180.0 || a.getDouble(3) > 180.0))
      return fromCoords2dImpl(df, iCol, jCol, xcCol, ycCol, crs,
        lon360 = true)
    val resRaw = 0.7 * math.sqrt(a.getDouble(0)) +
      0.3 * math.sqrt(a.getDouble(1))
    val resUnits =
      if (geographic) math.toDegrees(resRaw / er) else resRaw
    val res = roundToFraction(resUnits, 1, 0.5)
    require(res > 0.0, s"fromCoords2d: resolution estimate $res")
    // j-axis direction: mean y of the first pixel row vs the last
    val dir = base.agg(
      avg(when(col("__j") === j0, col("__y"))),
      avg(when(col("__j") === j1, col("__y")))).head()
    val yDown = dir.getDouble(0) > dir.getDouble(1)
    val xMin = xMinC - res / 2
    val yMin = yMinC - res / 2
    val width = math.max(2L, math.round((xMaxC + res / 2 - xMin) / res))
    val height = math.max(2L, math.round((yMaxC + res / 2 - yMin) / res))
    GridMapping(width, height, xMin, yMin, res, res, crs, yDown = yDown)
  }
}
