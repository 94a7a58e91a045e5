package graft.operators

import graft.cube.Cube
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** get_time_series (xcube/core/timeseries.py:50-205): spatial aggregation
  * per time step over an optional geometry mask, with the reference's agg
  * method set (mean, median, std, min, max, count — timeseries.py:40-47)
  * and `max_number_of_observations` normalization.
  *
  * Plan shape: geometry mask is a codegen'd projection (bbox pre-filter +
  * JTS predicate on survivors), then ONE map-side-combined groupBy(time).
  * The exact median/percentile is a sort-based agg per group — no
  * load-everything step like the reference's MUST_LOAD list needs
  * (timeseries.py:168-172).
  */
object TimeSeriesOps {

  /** Compute the per-time-step series of `varName`. NaN cells (outside the
    * geometry, invalid pixels) are skipped by every method. When
    * `maxObservations > 0`, adds `<var>_frac_obs` = valid count / max
    * (the reference's max_number_of_observations normalization).
    * `extraDims` names extra NON-SPATIAL dimension columns (depth,
    * wavelength — reference 1.13.3 #1213): the series is computed PER
    * LABEL of those dims, i.e. the groupBy key widens from (time) to
    * (time, extraDims…) — still one map-side-combined shuffle.
    */
  def getTimeSeries(cube: Cube, varName: String,
                    geometryWkt: Option[String] = None,
                    methods: Seq[String] = Seq("mean", "count"),
                    maxObservations: Long = 0L,
                    extraDims: Seq[String] = Nil,
                    clipToBbox: Boolean = false): DataFrame = {
    // `clipToBbox` drops rows outside the geometry's bounding box BEFORE
    // masking — a RECTANGULAR filter the connectors consume into chunk
    // pruning, so a polygon time series over a 10^7-chunk archive reads
    // only the chunks the bbox touches (the exact JTS predicate cannot
    // fold into a chunk reader; the bbox can, and the masked NaNs it
    // removes contributed nothing to any skipna aggregate anyway). Keep
    // it OFF for sparse relational cubes where a time slice with zero
    // bbox rows must still emit its count-0 row (xarray keeps the time
    // axis); a DENSE grid cube — every connector cube — has cells at
    // every slice, so clipping preserves the time axis exactly.
    val masked = geometryWkt.map(w =>
      GeomOps.maskByGeometry(cube, w, clip = clipToBbox)).getOrElse(cube)
    val v = col(varName)
    val aggCols = methods.map(m =>
      TemporalOps.methodAgg(m, v, masked.time).as(s"${varName}_$m")) ++
      (if (maxObservations > 0)
        Seq((count(when(!isnan(v.cast("double")), 1)).cast("double") /
          lit(maxObservations.toDouble)).as(s"${varName}_frac_obs"))
      else Nil)
    masked.df.groupBy(masked.time.as("time") +: extraDims.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Align per-method/per-variable series on the time axis — the xr.merge
    * of aggregation results (timeseries.py:193-200): multi-way full-outer
    * join on `on`.
    */
  def mergeSeries(series: Seq[DataFrame], on: String = "time"): DataFrame = {
    require(series.nonEmpty)
    series.reduce(_.join(_, Seq(on), "full_outer"))
  }
}
