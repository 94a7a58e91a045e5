package graft.operators

import graft.cube.Cube
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Volumes endpoint core (reference webapi/volumes/routes.py:26-182): a 3-D
  * (time, y, x) brick of a variable, decimated so the voxel count stays
  * under a budget, gathered to the driver for NRRD-style encoding.
  *
  * The stride is planned driver-side from the grid mapping; the scan is a
  * prunable bbox filter + modulo decimation (no shuffle), and the collect
  * is bounded by `maxVoxels`.
  */
object VolumeOps {

  final case class Brick(nt: Int, ny: Long, nx: Long, stride: Int,
                         values: Array[Double])

  /** Extract a brick of `varName` over the bbox with at most `maxVoxels`
    * voxels: spatial stride grows in powers of two until the budget fits.
    * `times` are the distinct time steps included (driver-known).
    */
  def brick(cube: Cube, varName: String,
            x1: Double, y1: Double, x2: Double, y2: Double,
            times: Seq[java.sql.Timestamp], maxVoxels: Long): Brick = {
    val gm = cube.gm
    val ij = gm.ijBboxFromXyBbox(x1, y1, x2, y2)
      .getOrElse(throw new IllegalArgumentException("bbox outside grid"))
    val (i0, j0, i1, j1) = ij
    var stride = 1
    def dims(s: Int): (Long, Long) = ((i1 - i0) / s + 1, (j1 - j0) / s + 1)
    while ({ val (nx, ny) = dims(stride); nx * ny * times.size > maxVoxels })
      stride *= 2
    val (nx, ny) = dims(stride)
    val i = gm.iExpr(cube.x)
    val j = gm.jExpr(cube.y)
    val rows = cube.df
      .filter(cube.time.isin(times.map(lit(_)): _*))
      .filter(cube.x.between(math.min(x1, x2), math.max(x1, x2)) &&
              cube.y.between(math.min(y1, y2), math.max(y1, y2)))
      .filter((i - i0) % stride === 0 && (j - j0) % stride === 0)
      .select(cube.time, ((j - j0) / stride).cast("long").as("bj"),
        ((i - i0) / stride).cast("long").as("bi"),
        col(varName).cast("double").as("v"))
      .collect()
    val tIndex = times.zipWithIndex.toMap
    val out = Array.fill((times.size * ny * nx).toInt)(Double.NaN)
    rows.foreach { (r: Row) =>
      val t = tIndex(r.getTimestamp(0))
      val idx = (t * ny + r.getLong(1)) * nx + r.getLong(2)
      out(idx.toInt) = r.getDouble(3)
    }
    Brick(times.size, ny, nx, stride, out)
  }
}
