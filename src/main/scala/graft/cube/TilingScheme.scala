package graft.cube

/** WMTS-style tile pyramid math — re-derivation of the reference's
  * TilingScheme (xcube/core/tilingscheme.py:35-448): geographic (2×1 tiles
  * at level 0 over ±180/±90) and web-mercator (1×1 over the square mercator
  * extent) pyramids, level↔resolution mapping, tile extents, point→tile.
  *
  * Pure driver-side planning math: the serving layer uses it to pick the
  * pyramid level table (`cube_L<k>`) and the (p_block-like) tile to scan.
  */
final case class TilingScheme(
    numLevel0TilesX: Int,
    numLevel0TilesY: Int,
    crsName: String,
    xMin: Double, yMin: Double, xMax: Double, yMax: Double,
    tileSize: Int = 256) {

  require(xMax > xMin && yMax > yMin)

  def numTilesX(level: Int): Long = numLevel0TilesX.toLong << level
  def numTilesY(level: Int): Long = numLevel0TilesY.toLong << level

  /** Map units per pixel at a level (tilingscheme.py resolution ladder). */
  def resolution(level: Int): Double =
    (xMax - xMin) / (numTilesX(level) * tileSize)

  /** Smallest level whose resolution is <= the requested one (i.e. detailed
    * enough), capped at maxLevel — the reference's level-for-resolution
    * selection used for pyramid pruning (mldataset/abc.py:136-149).
    */
  def levelForResolution(res: Double, maxLevel: Int = 30): Int = {
    var l = 0
    while (l < maxLevel && resolution(l) > res + 1e-15) l += 1
    l
  }

  /** World extent (x1, y1, x2, y2) of tile (tx, ty) at a level; ty counts
    * from the TOP row like WMTS/XYZ.
    */
  def tileExtent(level: Int, tx: Long, ty: Long): (Double, Double, Double, Double) = {
    val tw = (xMax - xMin) / numTilesX(level)
    val th = (yMax - yMin) / numTilesY(level)
    val x1 = xMin + tx * tw
    val y2 = yMax - ty * th
    (x1, y2 - th, x1 + tw, y2)
  }

  /** Tile containing a world point at a level (clamped to the pyramid). */
  def tileForPoint(level: Int, x: Double, y: Double): (Long, Long) = {
    val tx = ((x - xMin) / (xMax - xMin) * numTilesX(level)).toLong
    val ty = ((yMax - y) / (yMax - yMin) * numTilesY(level)).toLong
    (math.max(0L, math.min(numTilesX(level) - 1, tx)),
     math.max(0L, math.min(numTilesY(level) - 1, ty)))
  }
}

object TilingScheme {
  /** Geographic pyramid: 2×1 level-0 tiles over ±180 / ±90 (CRS84). */
  val geographic: TilingScheme =
    TilingScheme(2, 1, "CRS84", -180.0, -90.0, 180.0, 90.0)

  /** Web-mercator pyramid: 1×1 level-0 tile over the square extent. */
  val webMercator: TilingScheme = {
    val m = 20037508.342789244
    TilingScheme(1, 1, "EPSG:3857", -m, -m, m, m)
  }
}
