package graft.operators

import graft.cube.{GridMapping, TilingScheme}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tile gather (reference compute_tiles, xcube/core/tile.py:39-354): the
  * latency-critical serving read — pick the pyramid level for the tile's
  * resolution, bbox-subset that level, and gather the survivors into a
  * dense tileSize² array on the driver (the reference `collect`s the same
  * 256² array before PNG encoding).
  *
  * Only the tile's cells cross the wire: the bbox filter is prunable
  * against the partitioned layout, and a tile is bounded by tileSize² rows
  * regardless of cube size.
  */
object TileOps {

  /** Gather one tile of `varName` from a level's cell table (`df` has cube
    * coords x/y). Returns row-major (top row first) tileSize×tileSize
    * doubles, NaN where the cube has no cell.
    */
  def computeTile(df: DataFrame, gm: GridMapping, scheme: TilingScheme,
                  level: Int, tx: Long, ty: Long,
                  varName: String): Array[Double] = {
    val ts = scheme.tileSize
    val (x1, y1, x2, y2) = scheme.tileExtent(level, tx, ty)
    val cells = df
      .filter(col("x") >= x1 && col("x") < x2 && col("y") >= y1 && col("y") < y2)
      .select(gm.iExpr(col("x")).as("i"), gm.jExpr(col("y")).as("j"),
        col(varName).cast("double").as("v"))
      .collect()
    val out = Array.fill(ts * ts)(Double.NaN)
    val pxW = (x2 - x1) / ts
    val pxH = (y2 - y1) / ts
    cells.foreach { r =>
      val cx = gm.xForI(r.getLong(0))
      val cy = gm.yForJ(r.getLong(1))
      val px = math.floor((cx - x1) / pxW).toInt
      val py = math.floor((y2 - cy) / pxH).toInt // row 0 = top
      if (px >= 0 && px < ts && py >= 0 && py < ts)
        out(py * ts + px) = r.getDouble(2)
    }
    out
  }

  /** compute_rgba_tile colormap step (tile.py:355-763 + util/cmaps.py):
    * linear or log vmin..vmax normalization through a named colormap from
    * the [[graft.functions.Colormaps]] registry (viridis default, like the
    * reference's DEFAULT_CMAP_NAME); NaN → fully transparent. Packed ARGB
    * ints, ready for PNG encoding.
    */
  def renderRgba(tile: Array[Double], vmin: Double, vmax: Double,
                 logNorm: Boolean = false,
                 cmapName: String = "viridis"): Array[Int] = {
    val cmap = graft.functions.Colormaps.get(cmapName)
    tile.map { v =>
      if (v.isNaN) 0
      else {
        val t =
          if (logNorm && vmin > 0 && v > 0)
            math.max(0.0, math.min(1.0,
              math.log(v / vmin) / math.log(vmax / vmin)))
          else math.max(0.0, math.min(1.0, (v - vmin) / (vmax - vmin)))
        cmap.argb(t)
      }
    }
  }

  /** Full compute_rgba_tile tail: colormap + PNG bytes (tile.py:355-763's
    * final encode), via the JDK's ImageIO — no external codec.
    */
  def renderPng(tile: Array[Double], width: Int, height: Int,
                vmin: Double, vmax: Double,
                cmapName: String = "viridis"): Array[Byte] = {
    require(tile.length == width * height)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, width, height,
      renderRgba(tile, vmin, vmax, cmapName = cmapName), 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}
