package graft

import graft.cube.{CfGridMapping, WktCrs}
import org.scalatest.funsuite.AnyFunSuite

/** WKT1/WKT2 CRS parsing onto the registered family set — the
  * pyproj.CRS.from_wkt analog (reference reaches WKT through pyproj in
  * gridmapping/cfconv.py; mirrors test_cfconv.py's CRS discovery
  * cases). All documents here are CODE-LESS (no EPSG authority), so
  * resolution must come from the structural PROJECTION/PARAMETER
  * translation, not the id shortcut. */
class WktCrsSpec extends AnyFunSuite {

  private def resolve(wkt: String): Option[String] =
    CfGridMapping.crsFromCf(Map("crs_wkt" -> wkt))

  test("WKT1 Lambert-93 without authority resolves to EPSG:2154") {
    val wkt = """PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",""" +
      """DATUM["RGF93",SPHEROID["GRS 1980",6378137,298.257222101]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Lambert_Conformal_Conic_2SP"],""" +
      """PARAMETER["standard_parallel_1",49],""" +
      """PARAMETER["standard_parallel_2",44],""" +
      """PARAMETER["latitude_of_origin",46.5],""" +
      """PARAMETER["central_meridian",3],""" +
      """PARAMETER["false_easting",700000],""" +
      """PARAMETER["false_northing",6600000],UNIT["metre",1]]"""
    assert(resolve(wkt).contains("EPSG:2154"))
  }

  test("WKT2 Lambert-93 (EPSG long parameter names) resolves too") {
    val wkt = """PROJCRS["RGF93 / Lambert-93",""" +
      """BASEGEOGCRS["RGF93",DATUM["Reseau Geodesique Francais 1993",""" +
      """ELLIPSOID["GRS 1980",6378137,298.257222101]]],""" +
      """CONVERSION["Lambert-93",""" +
      """METHOD["Lambert Conic Conformal (2SP)"],""" +
      """PARAMETER["Latitude of false origin",46.5],""" +
      """PARAMETER["Longitude of false origin",3],""" +
      """PARAMETER["Latitude of 1st standard parallel",49],""" +
      """PARAMETER["Latitude of 2nd standard parallel",44],""" +
      """PARAMETER["Easting at false origin",700000],""" +
      """PARAMETER["Northing at false origin",6600000]],""" +
      """CS[Cartesian,2]]"""
    assert(resolve(wkt).contains("EPSG:2154"))
  }

  test("WKT1 UTM 33N without authority resolves to EPSG:32633") {
    val wkt = """PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",""" +
      """DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],""" +
      """PARAMETER["latitude_of_origin",0],""" +
      """PARAMETER["central_meridian",15],""" +
      """PARAMETER["scale_factor",0.9996],""" +
      """PARAMETER["false_easting",500000],""" +
      """PARAMETER["false_northing",0],UNIT["metre",1]]"""
    assert(resolve(wkt).contains("EPSG:32633"))
  }

  test("geographic-only WKT resolves to CRS84") {
    val wkt = """GEOGCS["WGS 84",DATUM["WGS_1984",""" +
      """SPHEROID["WGS 84",6378137,298.257223563]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]"""
    assert(resolve(wkt).contains("CRS84"))
    val wkt2 = """GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",""" +
      """ELLIPSOID["WGS 84",6378137,298.257223563]],CS[ellipsoidal,2]]"""
    assert(resolve(wkt2).contains("CRS84"))
  }

  test("a registered EPSG authority code short-circuits the parse") {
    val wkt = """PROJCS["WGS 84 / UTM zone 19S",""" +
      """PROJECTION["Transverse_Mercator"],""" +
      """PARAMETER["central_meridian",-69],""" +
      """AUTHORITY["EPSG","32719"]]"""
    assert(resolve(wkt).contains("EPSG:32719"))
  }

  test("a NON-registered authority code falls through to the " +
    "structural parse instead of passing the raw id") {
    // UNIT authority 9001 is the LAST id in this doc — the old
    // last-id-wins rule would have yielded nonsense EPSG:9001. The doc
    // carries NO false offsets, so per the CF default (0) it is a
    // ZERO-offset Lambert-93-parallels LCC — the generic form, NOT
    // EPSG:2154 (r20; the pre-generic leniency coerced it to the code,
    // displacing by the 700/6600 km offsets)
    val wkt = """PROJCS["custom LCC",GEOGCS["RGF93",""" +
      """DATUM["RGF93",SPHEROID["GRS 1980",6378137,298.257222101]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433,""" +
      """AUTHORITY["EPSG","9122"]]],""" +
      """PROJECTION["Lambert_Conformal_Conic_2SP"],""" +
      """PARAMETER["standard_parallel_1",49],""" +
      """PARAMETER["standard_parallel_2",44],""" +
      """PARAMETER["latitude_of_origin",46.5],""" +
      """PARAMETER["central_meridian",3],""" +
      """UNIT["metre",1,AUTHORITY["EPSG","9001"]]]"""
    assert(resolve(wkt).contains("LCC:49.0:44.0:46.5:3.0:0.0:0.0"))
    // with the offsets present it IS Lambert-93
    val withOff = wkt.replace("""UNIT["metre",1,AUTHORITY["EPSG","9001"]]]""",
      """PARAMETER["false_easting",700000],""" +
        """PARAMETER["false_northing",6600000],""" +
        """UNIT["metre",1,AUTHORITY["EPSG","9001"]]]""")
    assert(resolve(withOff).contains("EPSG:2154"))
  }

  test("unregistered projections and parameters decline LOUDLY") {
    val krovak = """PROJCS["S-JTSK / Krovak",""" +
      """PROJECTION["Krovak"],PARAMETER["latitude_of_center",49.5]]"""
    val ex = intercept[IllegalArgumentException] { resolve(krovak) }
    assert(ex.getMessage.contains("registered"))
    // a recognized 2SP family with non-registered parameters resolves
    // through the generic closed form since r20 (the conic math was
    // always fully parameterized)
    val conus = """PROJCS["NAD83 LCC",""" +
      """PROJECTION["Lambert_Conformal_Conic_2SP"],""" +
      """PARAMETER["standard_parallel_1",33],""" +
      """PARAMETER["standard_parallel_2",45],""" +
      """PARAMETER["latitude_of_origin",39],""" +
      """PARAMETER["central_meridian",-96]]"""
    assert(resolve(conus).contains("LCC:33.0:45.0:39.0:-96.0:0.0:0.0"))
    // ...but the 1SP method (EPSG 9801, scale-factor form) still declines
    val lcc1sp = """PROJCS["custom LCC 1SP",""" +
      """PROJECTION["Lambert_Conformal_Conic_1SP"],""" +
      """PARAMETER["latitude_of_origin",46.5],""" +
      """PARAMETER["central_meridian",3],""" +
      """PARAMETER["scale_factor",0.999]]"""
    intercept[IllegalArgumentException] { resolve(lcc1sp) }
    // ellipsoidal Mercator is NOT web-mercator: Mercator_1SP on the
    // WGS84 SPHEROID resolves to the EPSG:3395 closed form (r20)
    val merc3395 = """PROJCS["WGS 84 / World Mercator",GEOGCS["WGS 84",""" +
      """DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],""" +
      """PROJECTION["Mercator_1SP"],PARAMETER["scale_factor",1],""" +
      """PARAMETER["central_meridian",0]]"""
    assert(resolve(merc3395).contains("EPSG:3395"))
    // ...but the plain (9810) stereographic still has no closed form:
    // only the double (9809) family is registered, and they diverge
    // away from the origin
    val plainStereo = """PROJCS["custom stere",GEOGCS["WGS 84",""" +
      """DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],""" +
      """PROJECTION["Stereographic"],""" +
      """PARAMETER["latitude_of_origin",45],""" +
      """PARAMETER["central_meridian",25],PARAMETER["scale_factor",1]]"""
    val ex4 = intercept[IllegalArgumentException] { resolve(plainStereo) }
    assert(ex4.getMessage.contains("registered"))
    ()
  }

  test("WKT1 OSGB36 / British National Grid without authority resolves " +
    "to EPSG:27700 via the Airy ellipsoid + tmerc parameters") {
    val wkt = """PROJCS["OSGB36 / British National Grid",""" +
      """GEOGCS["OSGB36",DATUM["OSGB_1936",""" +
      """SPHEROID["Airy 1830",6377563.396,299.3249646]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],""" +
      """PARAMETER["latitude_of_origin",49],""" +
      """PARAMETER["central_meridian",-2],""" +
      """PARAMETER["scale_factor",0.9996012717],""" +
      """PARAMETER["false_easting",400000],""" +
      """PARAMETER["false_northing",-100000],UNIT["metre",1]]"""
    assert(resolve(wkt).contains("EPSG:27700"))
    // the ADVICE r19 trap: a code-less NON-WGS84 UTM (ED50 / UTM 33 on
    // the International ellipsoid) must NOT resolve to the WGS84 zone
    // code — it is ~100-200 m off
    val ed50 = """PROJCS["ED50 / UTM zone 33N",GEOGCS["ED50",""" +
      """DATUM["European_Datum_1950",""" +
      """SPHEROID["International 1924",6378388,297]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Transverse_Mercator"],""" +
      """PARAMETER["latitude_of_origin",0],""" +
      """PARAMETER["central_meridian",15],""" +
      """PARAMETER["scale_factor",0.9996],""" +
      """PARAMETER["false_easting",500000],""" +
      """PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val ex = intercept[IllegalArgumentException] { resolve(ed50) }
    assert(ex.getMessage.contains("ellipsoid"))
  }

  test("GDAL WKT1 with an EXTENSION PROJ4 clause follows the extension " +
    "(the spherical pseudo-mercator inside a Mercator_1SP shell)") {
    val gdal3857 = """PROJCS["WGS 84 / Pseudo-Mercator",""" +
      """GEOGCS["WGS 84",DATUM["WGS_1984",""" +
      """SPHEROID["WGS 84",6378137,298.257223563]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],""" +
      """PARAMETER["scale_factor",1],PARAMETER["false_easting",0],""" +
      """PARAMETER["false_northing",0],UNIT["metre",1],""" +
      """EXTENSION["PROJ4","+proj=merc +a=6378137 +b=6378137 """ +
      """+lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +no_defs"]]"""
    assert(resolve(gdal3857).contains("EPSG:3857"))
  }

  test("equidistant cylindrical routes: WKT2, proj string, CF name") {
    val wkt4087 = """PROJCRS["WGS 84 / World Equidistant Cylindrical",""" +
      """BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",""" +
      """ELLIPSOID["WGS 84",6378137,298.257223563]]],""" +
      """CONVERSION["World Equidistant Cylindrical",""" +
      """METHOD["Equidistant Cylindrical"],""" +
      """PARAMETER["Latitude of 1st standard parallel",0],""" +
      """PARAMETER["Longitude of natural origin",0],""" +
      """PARAMETER["False easting",0],PARAMETER["False northing",0]],""" +
      """CS[Cartesian,2]]"""
    assert(resolve(wkt4087).contains("EPSG:4087"))
    assert(resolve("+proj=eqc +lat_ts=0 +lon_0=0 +ellps=WGS84")
      .contains("EPSG:4087"))
    assert(resolve("+proj=eqc +lat_ts=30 +lon_0=10")
      .contains("EQC:30.0:10.0:0.0:0.0"))
    // a latitude-of-origin shift is not EPSG 1028
    intercept[IllegalArgumentException] {
      resolve("+proj=eqc +lat_0=15 +lat_ts=0")
    }
    ()
  }

  test("general and ellipsoidal Mercator / Gauss-Kruger proj routes") {
    // +proj=merc defaults to the WGS84 ELLIPSOIDAL form = EPSG:3395
    assert(resolve("+proj=merc").contains("EPSG:3395"))
    assert(resolve("+proj=merc +lon_0=110 +k=0.997 +x_0=3900000 " +
      "+y_0=900000 +ellps=bessel").contains("EPSG:3002"))
    assert(resolve("+proj=merc +lat_ts=42 +lon_0=51 +ellps=krass")
      .contains("EPSG:3388"))
    assert(resolve("+proj=merc +lat_ts=41 +lon_0=0")
      .contains("MERCSP:0.0:41.0:0.0:0.0"))
    assert(resolve("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy").contains("EPSG:27700"))
    assert(resolve("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 " +
      "+y_0=0 +ellps=bessel").contains("EPSG:31467"))
    // generic WGS84 tmerc resolves through the 9807 closed form
    assert(resolve("+proj=tmerc +lat_0=10.5 +lon_0=7 +k=0.9999 " +
      "+x_0=200000 +y_0=-50000")
      .contains("TMERC:10.5:7.0:0.9999:200000.0:-50000.0"))
    // a non-WGS84 UTM via proj declines (ED50 trap, proj form)
    intercept[IllegalArgumentException] {
      resolve("+proj=utm +zone=33 +ellps=intl")
    }
    // plain non-polar stere declines loudly (9810 vs 9809)
    intercept[IllegalArgumentException] {
      resolve("+proj=stere +lat_0=52 +lon_0=5 +k=0.9999")
    }
    ()
  }

  test("WKT1 RD New without authority resolves to EPSG:28992 via the " +
    "Bessel ellipsoid + oblique-stereographic parameters") {
    val wkt = """PROJCS["Amersfoort / RD New",GEOGCS["Amersfoort",""" +
      """DATUM["Amersfoort",""" +
      """SPHEROID["Bessel 1841",6377397.155,299.1528128]],""" +
      """PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],""" +
      """PROJECTION["Oblique_Stereographic"],""" +
      """PARAMETER["latitude_of_origin",52.15616055555556],""" +
      """PARAMETER["central_meridian",5.38763888888889],""" +
      """PARAMETER["scale_factor",0.9999079],""" +
      """PARAMETER["false_easting",155000],""" +
      """PARAMETER["false_northing",463000],UNIT["metre",1]]"""
    assert(resolve(wkt).contains("EPSG:28992"))
    // a WGS84 oblique stereographic yields the generic STEREO form
    val generic = """PROJCS["custom stereo",GEOGCS["WGS 84",""" +
      """DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]],""" +
      """PROJECTION["Oblique_Stereographic"],""" +
      """PARAMETER["latitude_of_origin",45],""" +
      """PARAMETER["central_meridian",25],""" +
      """PARAMETER["scale_factor",0.9999]]"""
    assert(resolve(generic).contains("STEREO:45.0:25.0:0.9999:0.0:0.0"))
  }

  test("WKT2 pseudo-mercator METHOD resolves to EPSG:3857") {
    val wkt = """PROJCRS["WGS 84 / Pseudo-Mercator",""" +
      """BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",""" +
      """ELLIPSOID["WGS 84",6378137,298.257223563]]],""" +
      """CONVERSION["Popular Visualisation Pseudo-Mercator",""" +
      """METHOD["Popular Visualisation Pseudo Mercator"],""" +
      """PARAMETER["Latitude of natural origin",0],""" +
      """PARAMETER["Longitude of natural origin",0]],CS[Cartesian,2]]"""
    assert(resolve(wkt).contains("EPSG:3857"))
  }

  test("proj strings resolve through the same family registry " +
    "(pyproj CRS.from_proj4 parity)") {
    assert(resolve("+proj=longlat +datum=WGS84 +no_defs").contains("CRS84"))
    assert(resolve("+proj=utm +zone=33 +datum=WGS84 +units=m")
      .contains("EPSG:32633"))
    assert(resolve("+proj=utm +zone=19 +south +datum=WGS84")
      .contains("EPSG:32719"))
    assert(resolve("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 " +
      "+x_0=700000 +y_0=6600000 +ellps=GRS80").contains("EPSG:2154"))
    assert(resolve("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 " +
      "+x_0=0 +y_0=0 +datum=WGS84").contains("EPSG:3413"))
    assert(resolve("+proj=sterea +lat_0=52.15616055555556 " +
      "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 " +
      "+ellps=bessel").contains("EPSG:28992"))
    assert(resolve("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 " +
      "+y_0=3210000 +ellps=GRS80").contains("EPSG:3035"))
    assert(resolve("+proj=cea +lat_ts=30 +lon_0=0 +ellps=WGS84")
      .contains("EPSG:6933"))
    assert(resolve("+proj=moll +lon_0=0").contains("MOLL:0.0"))
    assert(resolve("+proj=geos +h=35786023 +lon_0=-75 +sweep=x")
      .exists(_.startsWith("GEOS:-75")))
    assert(resolve("+proj=webmerc +datum=WGS84").contains("EPSG:3857"))
    assert(resolve("+proj=eqearth +lon_0=0 +datum=WGS84")
      .contains("EPSG:8857"))
    assert(resolve("+proj=eqearth +lon_0=10").contains("EQEARTH:10.0"))
    // Hotine oblique Mercator: the Swiss somerc shorthand hits LV95,
    // omerc with the RSO Borneo parameters hits EPSG:29873, a generic
    // WGS84 omerc yields the HOM form (variant A via +no_uoff)
    assert(resolve("+proj=somerc +lat_0=46.952405555555565 " +
      "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 " +
      "+ellps=bessel").contains("EPSG:2056"))
    assert(resolve("+proj=omerc +lat_0=4 +lonc=115 " +
      "+alpha=53.31582047222222 +gamma=53.13010236111111 +k_0=0.99984 " +
      "+x_0=590476.87 +y_0=442857.65 +ellps=evrstSS")
      .contains("EPSG:29873"))
    assert(resolve("+proj=omerc +lat_0=35 +lonc=-80 +alpha=30 " +
      "+gamma=30 +k_0=0.9996 +no_uoff")
      .contains("HOM:35.0:-80.0:30.0:30.0:0.9996:0.0:0.0:A"))
    // unregistered proj declines loudly; an explicit WGS84 a/b pair is
    // the ellipsoidal EPSG:3395 family (r20)
    intercept[IllegalArgumentException] { resolve("+proj=krovak +lat_0=49") }
    assert(resolve("+proj=merc +a=6378137 +b=6356752.3142")
      .contains("EPSG:3395"))
    // the 6378137-sphere mercator is the registered pseudo-mercator; a
    // DIFFERENT sphere radius scales every coordinate and declines (r20)
    assert(resolve("+proj=merc +a=6378137 +b=6378137")
      .contains("EPSG:3857"))
    intercept[IllegalArgumentException] {
      resolve("+proj=merc +a=6371000 +b=6371000")
    }
    ()
  }

  test("shifted/offset variants of registered families resolve to the " +
    "GENERIC parameterized form, never the registered code") {
    // Lambert-93 parallels with ZERO false offsets is NOT EPSG:2154
    // (700 km / 6600 km displacement if coerced) — since r20 it gets
    // the generic 2SP closed form with the RIGHT offsets instead of a
    // loud decline
    assert(resolve("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 " +
      "+x_0=0 +y_0=0 +ellps=GRS80")
      .contains("LCC:49.0:44.0:46.5:3.0:0.0:0.0"))
    // a shifted polar stereographic is not EPSG:3413 — generic form too
    assert(resolve("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 " +
      "+x_0=2000000 +y_0=2000000")
      .contains("PS:70.0:-45.0:2000000.0:2000000.0"))
    // generic azimuthal / conic forms from proj strings
    assert(resolve("+proj=laea +lat_0=45 +lon_0=20 +x_0=100000 " +
      "+y_0=200000 +ellps=WGS84")
      .contains("LAEA:45.0:20.0:100000.0:200000.0"))
    assert(resolve("+proj=aea +lat_1=20 +lat_2=50 +lat_0=30 +lon_0=10")
      .contains("ALBERS:20.0:50.0:30.0:10.0:0.0:0.0"))
    // variant-A polar stereographic (scale factor at the pole, no
    // lat_ts): the UPS offsets hit the registered codes, anything else
    // gets the generic PSA form (r20)
    assert(resolve("+proj=stere +lat_0=90 +k=0.994 +lon_0=0 " +
      "+x_0=2000000 +y_0=2000000").contains("EPSG:5041"))
    assert(resolve("+proj=stere +lat_0=-90 +k=0.994 +lon_0=0 " +
      "+x_0=2000000 +y_0=2000000").contains("EPSG:5042"))
    assert(resolve("+proj=stere +lat_0=90 +lon_0=0 +k=0.994")
      .contains("PSA:90.0:0.994:0.0:0.0:0.0"))
    // a non-Greenwich sinusoidal is not the MODIS grid (~1100 km at
    // the equator if coerced)
    intercept[IllegalArgumentException] { resolve("+proj=sinu +lon_0=10") }
    intercept[IllegalArgumentException] {
      CfGridMapping.crsFromCf(Map("grid_mapping_name" -> "sinusoidal",
        "longitude_of_projection_origin" -> "10.0"))
    }
    // CF mercator with an EXPLICIT ellipsoid is EPSG:3395 semantics —
    // since r20 that family has a registered closed form
    assert(CfGridMapping.crsFromCf(Map("grid_mapping_name" -> "mercator",
      "standard_parallel" -> "0.0",
      "semi_major_axis" -> "6378137.0",
      "inverse_flattening" -> "298.257223563")).contains("EPSG:3395"))
    // ...while a non-equatorial Mercator with NO ellipsoid attrs stays
    // ambiguous (spherical vs 9805) and declines loudly
    intercept[IllegalArgumentException] {
      CfGridMapping.crsFromCf(Map("grid_mapping_name" -> "mercator",
        "standard_parallel" -> "41.0"))
    }
    // CF non-WGS84 Mercator: the registered Makassar / Caspian combos
    assert(CfGridMapping.crsFromCf(Map("grid_mapping_name" -> "mercator",
      "longitude_of_projection_origin" -> "110.0",
      "scale_factor_at_projection_origin" -> "0.997",
      "false_easting" -> "3900000.0", "false_northing" -> "900000.0",
      "semi_major_axis" -> "6377397.155",
      "inverse_flattening" -> "299.1528128")).contains("EPSG:3002"))
    assert(CfGridMapping.crsFromCf(Map("grid_mapping_name" -> "mercator",
      "standard_parallel" -> "42.0",
      "longitude_of_projection_origin" -> "51.0",
      "semi_major_axis" -> "6378245.0",
      "inverse_flattening" -> "298.3")).contains("EPSG:3388"))
    // ABSENT offsets stay lenient: a zero-offset family omitting the
    // attributes still resolves (CF granules often leave them out)
    assert(CfGridMapping.crsFromCf(Map(
      "grid_mapping_name" -> "polar_stereographic",
      "standard_parallel" -> "70.0",
      "straight_vertical_longitude_from_pole" -> "-45.0"))
      .contains("EPSG:3413"))
    ()
  }

  test("non-WKT strings are not WKT: parse yields None, resolution " +
    "falls back to nothing") {
    assert(WktCrs.parse("+proj=lcc +lat_1=49 +lat_2=44").isEmpty)
    assert(WktCrs.parse("EPSG:2154").isEmpty)
    assert(resolve("just a comment").isEmpty)
    // escaped quotes inside WKT2 strings survive
    val n = WktCrs.parse("UNIT[\"metre \"\"m\"\"\",1]").get
    assert(n.strings.head == "metre \"m\"")
  }
}
