package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** GeoJSON vector source (reference store/fs/impl/geodataframe.py:19-96):
  * a FeatureCollection becomes a DataFrame with a WKT `geometry` column
  * plus one column per property — the vector-feature input of
  * rasterize_features / mask_by_geometry.
  *
  * Vector layers are driver-sized (the reference loads them into a
  * GeoDataFrame); parsing happens on the driver with Spark's bundled
  * Jackson, and the result distributes as an ordinary DataFrame.
  */
object GeoJsonSource {

  private def coordsToWkt(node: JsonNode, geomType: String): String = {
    def pt(c: JsonNode) = s"${c.get(0).asDouble} ${c.get(1).asDouble}"
    def ring(r: JsonNode) =
      "(" + r.elements.asScala.map(pt).mkString(", ") + ")"
    def poly(p: JsonNode) =
      "(" + p.elements.asScala.map(ring).mkString(", ") + ")"
    geomType match {
      case "Point" => s"POINT (${pt(node)})"
      case "MultiPoint" =>
        "MULTIPOINT (" + node.elements.asScala.map(pt).mkString(", ") + ")"
      case "LineString" => "LINESTRING " + ring(node)
      case "MultiLineString" => "MULTILINESTRING " + poly(node)
      case "Polygon" => "POLYGON " + poly(node)
      case "MultiPolygon" =>
        "MULTIPOLYGON (" + node.elements.asScala.map(poly).mkString(", ") + ")"
      case other => throw new IllegalArgumentException(s"unsupported geometry '$other'")
    }
  }

  /** Convert one GeoJSON geometry object (as a JsonNode) to WKT. */
  def geometryToWkt(geom: JsonNode): String =
    coordsToWkt(geom.get("coordinates"), geom.get("type").asText)

  /** Read a GeoJSON FeatureCollection file into (geometry: WKT, props...).
    * Property values become string, long, double, or boolean columns based
    * on the first feature carrying each property.
    */
  def readFeatures(spark: SparkSession, path: String): DataFrame = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    require(root.get("type").asText == "FeatureCollection", "expected a FeatureCollection")
    val features = root.get("features").elements.asScala.toVector

    // property schema from first occurrence of each key
    val propTypes = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    features.foreach { f =>
      Option(f.get("properties")).filterNot(_.isNull).foreach { props =>
        props.properties.asScala.foreach { e =>
          if (!propTypes.contains(e.getKey)) {
            val t = e.getValue match {
              case v if v.isIntegralNumber => LongType
              case v if v.isNumber => DoubleType
              case v if v.isBoolean => BooleanType
              case _ => StringType
            }
            propTypes(e.getKey) = t
          }
        }
      }
    }
    val schema = StructType(
      StructField("geometry", StringType) +:
        propTypes.toSeq.map { case (k, t) => StructField(k, t, nullable = true) })
    val rows = features.map { f =>
      val wkt = geometryToWkt(f.get("geometry"))
      val props = Option(f.get("properties")).filterNot(_.isNull)
      val vals = propTypes.toSeq.map { case (k, t) =>
        props.flatMap(p => Option(p.get(k))).filterNot(_.isNull).map { v =>
          t match {
            case LongType => v.asLong: java.lang.Long
            case DoubleType => v.asDouble: java.lang.Double
            case BooleanType => v.asBoolean: java.lang.Boolean
            case _ => v.asText
          }
        }.orNull
      }
      Row.fromSeq(wkt +: vals)
    }
    spark.createDataFrame(rows.asJava, schema)
  }
}
