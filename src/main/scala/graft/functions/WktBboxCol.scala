package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Envelope of a PER-ROW WKT column as `array(xMin, yMin, xMax, yMax)` —
  * the executor-side counterpart of [[GeomFunctions.wktBbox]], used by the
  * bucketed join-form rasterizer to explode each feature into the bbox
  * grid cells it overlaps. Parsed geometries' envelopes are cached per
  * distinct WKT per executor JVM, same policy as [[PointCoveredByCol]].
  */
case class WktBboxCol(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "wkt_bbox"

  override protected def nullSafeEval(w: Any): Any =
    WktBboxCol.bbox(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.WktBboxCol.bbox($w);")

  override protected def withNewChildInternal(newChild: Expression): WktBboxCol =
    copy(child = newChild)
}

object WktBboxCol {
  // per-thread LRU ([[LruCache]]): lock-free lookups on the per-row hot
  // path, and a layer with >4096 distinct WKTs re-parses only its coldest
  // geometries instead of dropping the whole cache each batch
  private val MaxEntries = 4096
  private val cache = LruCache.threadLocal[Array[Double]](MaxEntries)

  /** Codegen entry point (never sees null — nullSafeCodeGen short-circuits). */
  def bbox(wkt: UTF8String): ArrayData =
    ArrayData.toArrayData(cache.get().get(wkt.toString, { w =>
      val env = new org.locationtech.jts.io.WKTReader().read(w)
        .getEnvelopeInternal
      Array(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY)
    }))
}
