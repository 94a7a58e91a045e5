package graft.ops

import graft.{GraftSession, QueryPack}
import graft.operators.{ExtractOps, TimeSeriesOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point extraction + time-series pack (SURVEY §2.3/§2.4; reference
  * extract.py and timeseries.py).
  *
  * q_points_extract: points (derived from `orders`) indexed against the
  * events-cube grid — out-of-range coords keep index −1 and gather NaN
  * (surfaced as a `found` flag + sentinel so the hash compare never sees
  * NaN); in-range points broadcast-join the per-cell mean field.
  *
  * q_timeseries_geom: geometry-masked per-day series with the reference's
  * method set incl. exact interpolated median and sample std, plus the
  * max_number_of_observations fraction.
  */
object ExtractPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_points_extract" -> ((s, d) => {
      val cube = CubePack.eventsCube(s, d)
      val cells = ExtractOps.cellMeans(cube.copy(df = cube.df.drop("event_type")), Seq("v"))
      val points = GraftSession.table(s, d, "orders")
        .filter(col("o_orderkey") < 400)
        .select(col("o_orderkey").as("point_id"),
          ((col("o_orderkey") % 500) * 0.9 - 20.0).as("px"),
          ((col("o_custkey") % 130) - 10.0).cast("double").as("py"))
      val out = ExtractOps.valuesForPoints(points, CubePack.gm, "px", "py", cells, Seq("v"))
      out.select(col("point_id"), col("x_index"), col("y_index"),
        (!isnan(col("v"))).as("found"),
        when(isnan(col("v")), lit(-9999.0)).otherwise(col("v")).as("v_out"))
    }),

    "q_timeseries_geom" -> ((s, d) => {
      val cube = CubePack.eventsCube(s, d)
      val daily = cube.copy(df = cube.df
        .withColumn("time", date_trunc("DAY", col("time"))).drop("event_type"))
      TimeSeriesOps.getTimeSeries(daily, "v",
          geometryWkt = Some("POLYGON ((0 0, 200 0, 0 80, 0 0))"),
          methods = Seq("mean", "median", "std", "min", "max", "count"),
          maxObservations = 500L)
        .select(col("time"),
          round(col("v_mean"), 6).as("v_mean"),
          round(col("v_median"), 6).as("v_median"),
          round(col("v_std"), 6).as("v_std"),
          col("v_min"), col("v_max"), col("v_count"),
          round(col("v_frac_obs"), 6).as("v_frac_obs"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_points_extract" ->
      s"""WITH cells AS (
           SELECT floor(CAST(event_id % 360 AS DOUBLE) + 0.5)::BIGINT AS i,
                  floor(CAST(user_id % 100 AS DOUBLE) + 0.5)::BIGINT AS j,
                  round(avg(value), 6) AS v
           FROM events GROUP BY i, j),
         pts AS (
           SELECT o_orderkey AS point_id,
                  (o_orderkey % 500) * 0.9 - 20.0 AS px,
                  ((o_custkey % 130) - 10.0)::DOUBLE AS py
           FROM orders WHERE o_orderkey < 400),
         idx AS (
           SELECT point_id,
                  CASE WHEN px >= 0 AND px < 360 THEN floor(px)::BIGINT ELSE -1 END AS x_index,
                  CASE WHEN py >= 0 AND py < 100 THEN floor(py)::BIGINT ELSE -1 END AS y_index
           FROM pts)
         SELECT point_id, x_index, y_index,
                (c.v IS NOT NULL) AS found,
                coalesce(c.v, -9999.0) AS v_out
         FROM idx LEFT JOIN cells c ON c.i = idx.x_index AND c.j = idx.y_index""",
    "q_timeseries_geom" ->
      s"""WITH ${CubePack.cubeCte},
         m AS (
           SELECT date_trunc('day', time) AS time,
                  CASE WHEN x >= 0 AND y >= 0 AND (x / 200 + y / 80) <= 1 THEN v END AS v
           FROM cube)
         SELECT time,
                round(avg(v), 6) AS v_mean,
                round(quantile_cont(v, 0.5)::DOUBLE, 6) AS v_median,
                round(stddev_samp(v), 6) AS v_std,
                min(v) AS v_min, max(v) AS v_max, count(v) AS v_count,
                round(count(v)::DOUBLE / 500, 6) AS v_frac_obs
         FROM m GROUP BY time"""
  )
}
