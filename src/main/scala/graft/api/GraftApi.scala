package graft.api

import graft.cube.{Cube, GridMapping}
import graft.operators._
import graft.sources.{CubeWriter, DataStore}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fluent user-facing API: everything a reference user calls on an
  * `xr.Dataset` via the xcube accessor (xcube/core/xarray.py:33-179) hangs
  * off the Cube here, delegating to the operator objects. This is the
  * switch-over surface: open → subset/mask/evaluate → resample/aggregate →
  * write, all lazy DataFrame plans until an action.
  */
object syntax {

  implicit final class RichCube(private val c: Cube) extends AnyVal {

    // §2.2 projections / filters
    def selectVars(vars: String*): Cube = SelectOps.selectVars(c, vars)
    def dropVars(vars: String*): Cube = SelectOps.dropVars(c, vars)
    def spatialSubset(x1: Double, y1: Double, x2: Double, y2: Double): Cube =
      SelectOps.spatialSubset(c, x1, y1, x2, y2)
    def temporalSubset(t1: String, t2: String): Cube =
      SelectOps.temporalSubset(c, t1, t2)
    def maskByGeometry(wkt: String, clip: Boolean = false): Cube =
      GeomOps.maskByGeometry(c, wkt, clip)
    def clipByGeometry(wkt: String): Cube = GeomOps.clipByGeometry(c, wkt)
    def evaluate(configs: Evaluate.VarConfig*): Cube =
      c.withDf(Evaluate.evaluateDataset(_, configs))

    // §2.3 extraction
    def valuesForPoints(points: DataFrame, pxCol: String, pyCol: String,
                        vars: Seq[String]): DataFrame =
      ExtractOps.valuesForPoints(points, c.gm, pxCol, pyCol,
        ExtractOps.cellMeans(c, vars), vars)

    // §2.4 aggregation
    def timeSeries(varName: String, geometryWkt: Option[String] = None,
                   methods: Seq[String] = Seq("mean", "count"),
                   extraDims: Seq[String] = Nil): DataFrame =
      TimeSeriesOps.getTimeSeries(c, varName, geometryWkt, methods,
        extraDims = extraDims)
    def statisticsBy(varName: String, labelDims: String*): DataFrame =
      StatsOps.statisticsBy(c.df, varName, labelDims)
    /** Per-feature statistics of `varName` over a zone layer: burn the
      * zone property through [[GeomOps.rasterizeFeatures]] (expr or
      * bucketed-join form by layer size), then one aggregation per zone.
      */
    def zonalStatistics(features: DataFrame, geomCol: String,
                        zoneProp: String, varName: String): DataFrame = {
      import org.apache.spark.sql.functions._
      GeomOps.rasterizeFeatures(c, features, geomCol, Seq(zoneProp))
        .df.filter(!isnan(col(zoneProp)))
        .groupBy(col(zoneProp).cast("long").as("zone"))
        .agg(count(lit(1)).as("count"),
          min(col(varName)).as("minimum"), max(col(varName)).as("maximum"),
          avg(col(varName)).as("mean"))
    }
    def selNearest(dimCol: String, target: Double): Cube =
      c.withDf(df => SelectOps.nearestDimLabel(df, dimCol, target)._2)
    def resampleInTime(freq: String, aggs: Seq[(String, String)]): DataFrame =
      TemporalOps.resampleInTime(c.df, c.timeCol, freq, aggs)
    def subsample(k: Int, methods: Seq[(String, String)]): DataFrame =
      SubsampleOps.subsample(c, k, methods)._1

    // §2.13 maintenance
    def rechunked: Cube = MaintenanceOps.rechunk(c)
    def pruned(varName: String): Cube = MaintenanceOps.pruneEmptyBlocks(c, varName)
    def dumped: String = MaintenanceOps.dump(c)

    // §2.1 sinks
    def writePartitioned(path: String): Unit = CubeWriter.writePartitioned(c, path)
  }
}

/** Entry points: open_cube / write_cube (dsio.py:42-114). */
object Graft {
  def openCube(spark: SparkSession, path: String, gm: GridMapping): Cube =
    Cube(DataStore.openDataset(spark, path), gm)
  def openCube(spark: SparkSession, path: String): Cube =
    Cube.fromDataFrame(DataStore.openDataset(spark, path))
}

/** Named-operation registry (reference server compute ops
  * webapi/compute/context.py:58-248 + gen2 user-code executor): cube
  * transforms registered by name and applied by lookup — the BYOA hook.
  */
object OperationRegistry {
  private val ops = scala.collection.concurrent.TrieMap.empty[String, Cube => Cube]

  def register(name: String)(op: Cube => Cube): Unit = ops.put(name, op)
  def names: Seq[String] = ops.keys.toSeq.sorted
  def apply(name: String, cube: Cube): Cube =
    ops.getOrElse(name, throw new NoSuchElementException(s"operation '$name'"))(cube)

  // built-ins mirroring webapi/compute/operations.py:13-33
  register("spatial_subset") { c =>
    SelectOps.spatialSubset(c, c.gm.xMin, c.gm.yMin,
      c.gm.xMin + (c.gm.xMax - c.gm.xMin) / 2, c.gm.yMin + (c.gm.yMax - c.gm.yMin) / 2)
  }
  register("identity")(identity)
}
