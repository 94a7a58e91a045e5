package graft.cube

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial grid metadata carried next to a cube DataFrame.
  *
  * Spark-first re-expression of the reference's GridMapping
  * (xcube/core/gridmapping/base.py:42-135): image size, bbox, x/y
  * resolution, CRS, y-axis orientation. Pixel↔world math is exposed both as
  * plain Scala (driver-side planning, e.g. bbox → partition pruning) and as
  * `Column` expressions (executor-side, codegen'd — no UDF).
  *
  * Only regular grids are modeled; irregular (2-D coord) sources are
  * rectified onto a regular grid first (reference resampling/rectify.py:23,
  * SURVEY §2.11).
  */
final case class GridMapping(
    width: Long,
    height: Long,
    xMin: Double,
    yMin: Double,
    xRes: Double,
    yRes: Double,
    crs: String = "CRS84",
    /** true when row index 0 is the *maximum* y (image convention). */
    yDown: Boolean = false,
    tileWidth: Long = 512,
    tileHeight: Long = 512) {

  def xMax: Double = xMin + width * xRes
  def yMax: Double = yMin + height * yRes
  /** (xMin, yMin, xMax, yMax) — reference base.py:85-93. */
  def xyBbox: (Double, Double, Double, Double) = (xMin, yMin, xMax, yMax)

  /** World coordinate of the center of pixel column i. */
  def xForI(i: Long): Double = xMin + (i + 0.5) * xRes
  def yForJ(j: Long): Double =
    if (yDown) yMax - (j + 0.5) * yRes else yMin + (j + 0.5) * yRes

  /** Fractional pixel index for a world coordinate (driver-side). */
  def iForX(x: Double): Long = math.floor((x - xMin) / xRes).toLong
  def jForY(y: Double): Long =
    if (yDown) math.floor((yMax - y) / yRes).toLong
    else math.floor((y - yMin) / yRes).toLong

  /** Pixel bbox for a world bbox, clipped to the image, optional border —
    * reference ij_bbox_from_xy_bbox (base.py:527).
    * Returns (i0, j0, i1, j1) inclusive, or None if fully outside.
    */
  def ijBboxFromXyBbox(x1: Double, y1: Double, x2: Double, y2: Double,
                       border: Long = 0): Option[(Long, Long, Long, Long)] = {
    val i0 = math.max(0L, iForX(math.min(x1, x2)) - border)
    val i1 = math.min(width - 1, iForX(math.max(x1, x2)) + border)
    val (jA, jB) = (jForY(y1), jForY(y2))
    val j0 = math.max(0L, math.min(jA, jB) - border)
    val j1 = math.min(height - 1, math.max(jA, jB) + border)
    if (i0 > i1 || j0 > j1) None else Some((i0, j0, i1, j1))
  }

  /** Column expression: pixel column index of world-x (codegen arithmetic,
    * stays inside WholeStageCodegen — reference extract.py:321 interp for
    * the regular-grid fast path).
    */
  def iExpr(x: Column): Column = floor((x - lit(xMin)) / lit(xRes)).cast("long")
  def jExpr(y: Column): Column =
    if (yDown) floor((lit(yMax) - y) / lit(yRes)).cast("long")
    else floor((y - lit(yMin)) / lit(yRes)).cast("long")

  /** Column expression: world coordinate of pixel-center for an index. */
  def xExpr(i: Column): Column = lit(xMin) + (i.cast("double") + lit(0.5)) * lit(xRes)
  def yExpr(j: Column): Column =
    if (yDown) lit(yMax) - (j.cast("double") + lit(0.5)) * lit(yRes)
    else lit(yMin) + (j.cast("double") + lit(0.5)) * lit(yRes)

  /** Snap a world coordinate to its containing cell center (nearest-cell
    * lookup, reference extract.py "Nearest" method).
    */
  def snapXExpr(x: Column): Column = xExpr(iExpr(x))
  def snapYExpr(y: Column): Column = yExpr(jExpr(y))

  /** Derived mapping with resolution scaled by f (pyramid levels) —
    * reference base.py:199 `scale`. Level l+1 halves the image size:
    * size[l+1] = (size[l]+1)/2 (mldataset/abc.py:18-31).
    */
  def scale(f: Double): GridMapping =
    copy(width = math.max(1L, math.round(width / f)),
         height = math.max(1L, math.round(height / f)),
         xRes = xRes * f, yRes = yRes * f)

  /** Affine pixel-coordinate transform onto `other`'s grid (reference
    * base.py:453 `ij_transform_to`, the composition of this mapping's
    * ij→xy matrix with `other`'s xy→ij matrix, base.py:429-451):
    * (i', j') = (sx·i + ox, sy·j + oy) in pixel-EDGE coordinates,
    * handling mixed j-axis conventions by sign. Same-CRS regular
    * grids only — a cross-CRS request must go through
    * [[GmTransform.transform]]. */
  def ijTransformTo(other: GridMapping): GridMapping.IjTransform = {
    require(graft.operators.SpatialOps.sameCrs(crs, other.crs),
      s"ijTransformTo needs one CRS, got $crs -> ${other.crs} " +
        "(use GmTransform.transform for reprojection)")
    val sx = xRes / other.xRes
    val ox = (xMin - other.xMin) / other.xRes
    val (c, d) = if (yDown) (-yRes, yMax) else (yRes, yMin)
    val (sy, oy) =
      if (other.yDown) (-c / other.yRes, (other.yMax - d) / other.yRes)
      else (c / other.yRes, (d - other.yMin) / other.yRes)
    GridMapping.IjTransform(sx, ox, sy, oy)
  }

  /** base.py:472 `ij_transform_from`: the inverse direction. */
  def ijTransformFrom(other: GridMapping): GridMapping.IjTransform =
    other.ijTransformTo(this)

  def levelMapping(level: Int): GridMapping = {
    var (w, h) = (width, height)
    (0 until level).foreach { _ => w = (w + 1) / 2; h = (h + 1) / 2 }
    copy(width = w, height = h,
         xRes = xRes * (1L << level), yRes = yRes * (1L << level))
  }

  /** Spatial block key for co-located processing: cells in the same
    * tileWidth×tileHeight block share a key. Partitioning 100 TB cubes by
    * (time, blockKey) keeps bbox queries to a handful of partitions.
    */
  def blockKeyExpr(x: Column, y: Column): Column =
    floor(jExpr(y) / lit(tileHeight)).cast("long") *
      lit((width + tileWidth - 1) / tileWidth) +
      floor(iExpr(x) / lit(tileWidth)).cast("long")
}

object GridMapping {

  /** An affine pixel-coordinate transform (i', j') = (sx·i + ox,
    * sy·j + oy) — the reference's AffineTransformMatrix restricted to
    * the axis-aligned case regular grids produce. */
  final case class IjTransform(sx: Double, ox: Double,
                               sy: Double, oy: Double) {
    def apply(i: Double, j: Double): (Double, Double) =
      (sx * i + ox, sy * j + oy)
    /** The inverse transform (base.py:488 `~a`). */
    def inverse: IjTransform =
      IjTransform(1.0 / sx, -ox / sx, 1.0 / sy, -oy / sy)
  }

  /** Global 1-degree geographic grid — the reference's default test grid
    * (new.py:13-268).
    */
  val global1deg: GridMapping =
    GridMapping(360, 180, -180.0, -90.0, 1.0, 1.0)

  /** Regular factory mirroring GridMapping.regular (base.py:752). */
  def regular(size: (Long, Long), xyMin: (Double, Double), xyRes: (Double, Double),
              crs: String = "CRS84"): GridMapping =
    GridMapping(size._1, size._2, xyMin._1, xyMin._2, xyRes._1, xyRes._2, crs)
}
