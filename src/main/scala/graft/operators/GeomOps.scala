package graft.operators

import graft.cube.Cube
import graft.functions.GeomFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Geometry masking and rasterization — re-expression of
  * xcube/core/geom.py on the long-format cube.
  */
object GeomOps {

  /** mask_dataset_by_geometry (geom.py:284-423): NaN-out variable values at
    * cells outside the geometry; optionally clip rows to the geometry bbox.
    * The bbox pre-filter is codegen'd and prunable; the exact predicate
    * (JTS prepared geometry) only runs on bbox survivors.
    */
  def maskByGeometry(cube: Cube, wkt: String, clip: Boolean = false,
                     saveMask: Option[String] = None): Cube = {
    val inG = GeomFunctions.geomMask(wkt)(cube.x, cube.y)
    var df = cube.df
    if (clip) {
      val (x1, y1, x2, y2) = GeomFunctions.wktBbox(wkt)
      df = df.filter(cube.x.between(x1, x2) && cube.y.between(y1, y2))
    }
    df = df.withColumn("__in_geom", inG)
    // NaN is the missing-value marker for float variables only (the
    // reference casts int vars to float when masking; we leave non-numeric
    // columns such as labels untouched).
    val numeric = cube.varNames.filter { v =>
      df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    }
    for (v <- numeric)
      df = df.withColumn(v,
        when(col("__in_geom"), col(v).cast("double")).otherwise(lit(Double.NaN)))
    saveMask.foreach(m => df = df.withColumn(m, col("__in_geom")))
    cube.copy(df = df.drop("__in_geom"))
  }

  /** clip_dataset_by_geometry (geom.py:445-529): drop rows outside the
    * geometry's bbox — pure prunable filter.
    */
  def clipByGeometry(cube: Cube, wkt: String): Cube = {
    val (x1, y1, x2, y2) = GeomFunctions.wktBbox(wkt)
    cube.withDf(_.filter(cube.x.between(x1, x2) && cube.y.between(y1, y2)))
  }

  /** rasterize_features (geom.py:51-281): burn feature properties into the
    * cube. Broadcast spatial join — cells × features on point-in-geometry,
    * last-feature-wins on overlap (geom.py:262-280) via max feature index.
    * The features table is small (vector data) → broadcast; the cube side
    * never shuffles.
    */
  def rasterizeFeatures(cube: Cube, features: DataFrame, geomCol: String,
                        props: Seq[String]): Cube = {
    val feat = features.withColumn("__fidx", monotonically_increasing_id())
    val joined = cube.df.join(
      broadcast(feat),
      GeomFunctions.inGeomCol(col(geomCol), cube.x, cube.y),
      "left_outer")
    // last feature wins: keep the max __fidx per cell
    val keys = Seq(cube.timeCol, cube.yCol, cube.xCol).map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col("__fidx").desc_nulls_last)
    val best = joined.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    val cubeCols = cube.df.columns.map(col).toSeq
    val propCols = props.map(p => col(p).cast("double").as(p))
    cube.copy(df = best.select(cubeCols ++ propCols: _*))
  }
}
