package graft.ops

import graft.{GraftSession, QueryPack}
import graft.operators.{CalendarOps, TemporalOps, TimeSeriesOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** resample_in_time oracle pack (SURVEY §2.4/§2.5; reference
  * resampling/temporal.py:17-161): downsampling to 1D/8D/1M buckets across
  * the full method set, and window-based upsampling (ffill/interpolate) on a
  * dense daily grid.
  *
  * Scale notes: every downsample is one map-side-combined shuffle on
  * (bucket, event_type) — a tiny key space. The upsample windows partition
  * by user (at 100 TB: by spatial cell) so no global sort ever happens.
  */
object TemporalPack extends QueryPack {

  private def ev(s: SparkSession, d: String): DataFrame = GraftSession.events(s, d)

  /** DuckDB epoch-anchored bucket mirroring TemporalOps.bucketStart for
    * fixed frequencies.
    */
  private def duckBucket(sec: Long): String =
    s"make_timestamp((floor(epoch(ts) / $sec) * $sec * 1000000)::BIGINT)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 1-day buckets × basic method set (mean/sum/count/min/max)
    "q_resample_1d" -> ((s, d) => {
      TemporalOps.resampleInTime(ev(s, d), "ts", "1D",
          Seq("value" -> "mean", "value" -> "sum", "value" -> "count",
              "value" -> "min", "value" -> "max"),
          extraKeys = Seq("event_type"))
        .select(col("t"), col("event_type"),
          round(col("value_mean"), 6).as("value_mean"),
          round(col("value_sum"), 6).as("value_sum"),
          col("value_count"), col("value_min"), col("value_max"))
    }),

    // epoch-anchored 8-day buckets × order-statistics methods
    // (exact interpolated median/percentile + sample std/var)
    "q_resample_8d" -> ((s, d) => {
      TemporalOps.resampleInTime(ev(s, d), "ts", "8D",
          Seq("value" -> "median", "value" -> "std", "value" -> "var",
              "value" -> "percentile_90"),
          extraKeys = Seq("event_type"))
        .select(col("t"), col("event_type"),
          round(col("value_median"), 6).as("value_median"),
          round(col("value_std"), 6).as("value_std"),
          round(col("value_var"), 6).as("value_var"),
          round(col("value_percentile_90"), 6).as("value_p90"))
    }),

    // calendar-month buckets × positional methods (first/last in time order,
    // argmax = time of the max value, latest-ts tiebreak)
    "q_resample_1m" -> ((s, d) => {
      TemporalOps.resampleInTime(ev(s, d), "ts", "1M",
          Seq("value" -> "first", "value" -> "last", "value" -> "argmax",
              "value" -> "count"),
          extraKeys = Seq("event_type"))
        .withColumnRenamed("value_argmax", "t_argmax")
    }),

    // boolean reducers all/any over derived flags (temporal.py method set)
    "q_resample_anyall" -> ((s, d) => {
      val flagged = ev(s, d)
        .withColumn("gt1", col("value") > 1.0)
        .withColumn("gt100", col("value") > 100.0)
      TemporalOps.resampleInTime(flagged, "ts", "8D",
          Seq("gt1" -> "all", "gt100" -> "any", "gt1" -> "count"),
          extraKeys = Seq("event_type"))
        .select(col("t"), col("event_type"),
          col("gt1_all").as("all_gt1"), col("gt100_any").as("any_gt100"),
          col("gt1_count").as("n"))
    }),

    // upsampling: per-user daily series on a dense 30-day grid, forward-fill
    // + time-weighted linear interpolation (temporal.py:138-161)
    "q_resample_upsample" -> ((s, d) => {
      val daily = ev(s, d).filter(col("user_id") < 8)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(avg(col("value")), 6).as("v"))
      val users = daily.select("user_id").distinct()
      val days = ev(s, d).sparkSession.range(1)
        .select(explode(sequence(
          lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val grid = users.crossJoin(days)
      val joined = grid.join(daily, Seq("user_id", "day"), "left")
      val filled = TemporalOps.ffill(joined, Seq("user_id"), "day", "v", "v_ffill")
      val interp = TemporalOps.interpolate(filled, Seq("user_id"), "day", "v",
        "v_interp", t => datediff(t, lit("2024-01-01").cast("date")).cast("double"))
      // day emitted as timestamp: Spark DATE→pandas object vs DuckDB DATE→
      // datetime64 would make the driver's dtype-strict compare fail.
      // v_interp rounded via floor(x*1e6 + 0.5): gap-2 interpolation of
      // 1e-6-grid values yields exact .xxxxxx5 doubles, where the two
      // engines' round() implementations disagree ~1% of the time; floor of
      // the identically-computed double is bit-deterministic.
      interp.select(col("user_id"), col("day").cast("timestamp").as("day"),
        col("v_ffill"),
        (floor(col("v_interp") * 1e6 + 0.5) / 1e6).as("v_interp"))
    }),

    // upsampling method "nearest" with a tolerance: sparse per-user series
    // (every 5th day) reindexed to the dense grid; rows farther than 2 days
    // from any sample stay null (temporal.py nearest + pandas tolerance)
    "q_resample_nearest" -> ((s, d) => {
      val daily = ev(s, d).filter(col("user_id") < 8)
        .withColumn("day", to_date(col("ts")))
        .filter(dayofmonth(col("day")) % 5 === 1)
        .groupBy(col("user_id"), col("day"))
        .agg(round(avg(col("value")), 6).as("v"))
      val users = daily.select("user_id").distinct()
      val days = ev(s, d).sparkSession.range(1)
        .select(explode(sequence(
          lit("2024-01-01").cast("date"), lit("2024-01-30").cast("date"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val joined = users.crossJoin(days).join(daily, Seq("user_id", "day"), "left")
      TemporalOps.nearestFill(joined, Seq("user_id"), "day", "v", "v_nearest",
          t => datediff(t, lit("2024-01-01").cast("date")).cast("double"),
          tolerance = Some(2.0))
        .select(col("user_id"), col("day").cast("timestamp").as("day"),
          col("v_nearest"))
    }),

    // max_valids: the 5 most recent valid rows per key (controllers.py:301)
    "q_max_valids" -> ((s, d) => {
      TemporalOps.maxValids(ev(s, d), Seq("event_type"), "ts",
          col("value") > 10.0, 5, "event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 6).as("sum_value"),
          max(col("ts")).as("latest"))
    }),

    // xr.merge of per-method aggregation results: three day series aligned
    // on the time axis by multi-way full-outer join (timeseries.py:193-200)
    "q_merge_series" -> ((s, d) => {
      val e = ev(s, d).withColumn("time", date_trunc("DAY", col("ts")))
      val s1 = e.groupBy("time").agg(round(avg(col("value")), 6).as("v_mean"))
      val s2 = e.filter(col("event_type") === "click")
        .groupBy("time").agg(count(lit(1)).as("n_click"))
      val s3 = e.groupBy("time").agg(max(col("value")).as("v_max"))
      TimeSeriesOps.mergeSeries(Seq(s1, s2, s3))
        .select(col("time"), col("v_mean"),
          coalesce(col("n_click"), lit(0L)).as("n_click"), col("v_max"))
    }),

    // CF non-Gregorian calendars (timecoord.py:114 routes these through
    // cftime): climate-model time axes stored as integer "days since epoch"
    // under 360_day / noleap calendars, decoded with per-row integer
    // arithmetic (no UDF, stays in codegen) and resampled to calendar
    // months IN THAT CALENDAR — real-calendar date_trunc would shift every
    // month boundary. Sums are exact (DECIMAL) before the final cast.
    "q_calendar_resample" -> ((s, d) => {
      val base = ev(s, d).select(
        (col("event_id") % 1000).as("days"),
        col("value").cast("decimal(18,2)").as("v"))
      def monthly(cal: String): DataFrame = {
        val f = CalendarOps.decode(col("days"), cal)
        base.select(lit(cal).as("calendar"),
            f.getField("year").as("year"), f.getField("month").as("month"),
            f.getField("day").as("day"), col("v"))
          .groupBy("calendar", "year", "month")
          .agg(count(lit(1)).as("n"),
            sum(col("v")).cast("double").as("sum_v"),
            max(col("day")).as("max_day"))
      }
      monthly("360_day").unionByName(monthly("noleap"))
    }),

    // Julian calendar (cftime DatetimeJulian, timecoord.py:33-300): mod-4
    // leap rule with NO century exception. days span >2 of the fixed 1461-
    // day cycles so leap and common Februaries both land in the aggregate;
    // the oracle re-derives the same cycle arithmetic in SQL and joins the
    // month table from the shared constants.
    "q_calendar_julian" -> ((s, d) => {
      val f = CalendarOps.decode((col("event_id") % 3000).as("days"), "julian")
      ev(s, d).select(
          f.getField("year").as("year"), f.getField("month").as("month"),
          f.getField("day").as("day"), f.getField("doy").as("doy"),
          col("value").cast("decimal(18,2)").as("v"))
        .groupBy("year", "month")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("double").as("sum_v"),
          max(col("day")).as("max_day"), max(col("doy")).as("max_doy"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_resample_1d" ->
      """SELECT date_trunc('day', ts) AS t, event_type,
         round(avg(value), 6) AS value_mean,
         round(sum(value), 6) AS value_sum,
         count(value) AS value_count,
         min(value) AS value_min, max(value) AS value_max
         FROM events GROUP BY t, event_type""",
    "q_resample_8d" ->
      s"""SELECT ${duckBucket(691200L)} AS t, event_type,
         round(quantile_cont(value, 0.5)::DOUBLE, 6) AS value_median,
         round(stddev_samp(value), 6) AS value_std,
         round(var_samp(value), 6) AS value_var,
         round(quantile_cont(value, 0.9)::DOUBLE, 6) AS value_p90
         FROM events GROUP BY t, event_type""",
    "q_resample_1m" ->
      """WITH b AS (
           SELECT date_trunc('month', ts) AS t, event_type, ts, value,
                  max(value) OVER (PARTITION BY date_trunc('month', ts), event_type) AS mx
           FROM events)
         SELECT t, event_type,
                arg_min(value, ts) AS value_first,
                arg_max(value, ts) AS value_last,
                max(CASE WHEN value = mx THEN ts END) AS t_argmax,
                count(value) AS value_count
         FROM b GROUP BY t, event_type""",
    "q_resample_anyall" ->
      s"""SELECT ${duckBucket(691200L)} AS t, event_type,
         bool_and(value > 1.0) AS all_gt1,
         bool_or(value > 100.0) AS any_gt100,
         count(*) AS n
         FROM events GROUP BY t, event_type""",
    "q_resample_upsample" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day, round(avg(value), 6) AS v
           FROM events WHERE user_id < 8 GROUP BY user_id, day),
         grid AS (
           SELECT u.user_id, d.day
           FROM (SELECT DISTINCT user_id FROM daily) u
           CROSS JOIN (SELECT unnest(generate_series(DATE '2024-01-01',
                       DATE '2024-01-30', INTERVAL 1 DAY))::DATE AS day) d),
         j AS (
           SELECT g.user_id, g.day, daily.v
           FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day),
         w AS (
           SELECT user_id, day, v,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           FROM j)
         SELECT user_id, day::TIMESTAMP AS day, v_ffill,
           floor((CASE WHEN v IS NOT NULL THEN v
                       WHEN pd IS NULL THEN nv
                       WHEN nd IS NULL THEN v_ffill
                       ELSE v_ffill + (nv - v_ffill) *
                            (date_diff('day', pd, day)::DOUBLE /
                             date_diff('day', pd, nd)::DOUBLE)
                  END) * 1e6 + 0.5) / 1e6 AS v_interp
         FROM w""",
    "q_resample_nearest" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day, round(avg(value), 6) AS v
           FROM events
           WHERE user_id < 8 AND date_part('day', CAST(ts AS DATE)) % 5 = 1
           GROUP BY user_id, day),
         grid AS (
           SELECT u.user_id, d.day
           FROM (SELECT DISTINCT user_id FROM daily) u
           CROSS JOIN (SELECT unnest(generate_series(DATE '2024-01-01',
                       DATE '2024-01-30', INTERVAL 1 DAY))::DATE AS day) d),
         j AS (
           SELECT g.user_id, g.day, daily.v
           FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day),
         w AS (
           SELECT user_id, day, v,
             last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           FROM j)
         SELECT user_id, day::TIMESTAMP AS day,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL AND nv IS NULL THEN NULL
                WHEN pv IS NULL THEN
                  CASE WHEN date_diff('day', day, nd) <= 2 THEN nv END
                WHEN nv IS NULL THEN
                  CASE WHEN date_diff('day', pd, day) <= 2 THEN pv END
                WHEN date_diff('day', pd, day) <= date_diff('day', day, nd) THEN
                  CASE WHEN date_diff('day', pd, day) <= 2 THEN pv END
                ELSE CASE WHEN date_diff('day', day, nd) <= 2 THEN nv END
           END AS v_nearest
         FROM w""",
    "q_max_valids" ->
      """WITH f AS (SELECT * FROM events WHERE value > 10.0),
         r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                       ORDER BY ts DESC, event_id DESC) AS rn FROM f)
         SELECT event_type, count(*) AS n,
                round(sum(value), 6) AS sum_value, max(ts) AS latest
         FROM r WHERE rn <= 5 GROUP BY event_type""",
    "q_merge_series" ->
      """WITH e AS (SELECT date_trunc('day', ts) AS time, event_type, value FROM events),
         s1 AS (SELECT time, round(avg(value), 6) AS v_mean FROM e GROUP BY time),
         s2 AS (SELECT time, count(*) AS n_click FROM e
                WHERE event_type = 'click' GROUP BY time),
         s3 AS (SELECT time, max(value) AS v_max FROM e GROUP BY time)
         SELECT s1.time, s1.v_mean, coalesce(s2.n_click, 0) AS n_click, s3.v_max
         FROM s1
         FULL OUTER JOIN s2 ON s1.time = s2.time
         FULL OUTER JOIN s3 ON s1.time = s3.time""",
    "q_calendar_resample" ->
      s"""WITH e AS (SELECT event_id % 1000 AS days,
                            CAST(value AS DECIMAL(18,2)) AS v FROM events),
         c1 AS (SELECT '360_day' AS calendar,
                       2000 + days // 360 AS year,
                       (days % 360) // 30 + 1 AS month,
                       (days % 360) % 30 + 1 AS day, v
                FROM e),
         c2 AS (SELECT 'noleap' AS calendar,
                       2000 + days // 365 AS year,
                       cal.m AS month,
                       days % 365 - cal.s0 + 1 AS day, v
                FROM e JOIN (${CalendarOps.monthTableSql("noleap")}) cal(m, s0, e0)
                  ON days % 365 >= cal.s0 AND days % 365 < cal.e0),
         u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
         SELECT calendar, year, month, count(*) AS n,
                sum(v)::DOUBLE AS sum_v, max(day) AS max_day
         FROM u GROUP BY calendar, year, month""",
    "q_calendar_julian" ->
      s"""WITH e AS (SELECT event_id % 3000 AS days,
                            CAST(value AS DECIMAL(18,2)) AS v FROM events),
         j0 AS (SELECT days % 1461 AS r, days // 1461 AS cyc, v FROM e),
         j1 AS (SELECT r, cyc, v,
                       CASE WHEN r < 366 THEN 0
                            ELSE (r - 366) // 365 + 1 END AS yoff
                FROM j0),
         j2 AS (SELECT v, 2000 + cyc * 4 + yoff AS year, yoff = 0 AS leap,
                       r - CASE WHEN yoff = 0 THEN 0
                                ELSE 366 + 365 * (yoff - 1) END AS doy0
                FROM j1),
         jl AS (SELECT year, cal.m::BIGINT AS month, doy0 - cal.s0 + 1 AS day,
                       doy0 + 1 AS doy, v
                FROM j2 JOIN (${CalendarOps.monthTableSql("all_leap")}) cal(m, s0, e0)
                  ON doy0 >= cal.s0 AND doy0 < cal.e0
                WHERE leap),
         jn AS (SELECT year, cal.m::BIGINT AS month, doy0 - cal.s0 + 1 AS day,
                       doy0 + 1 AS doy, v
                FROM j2 JOIN (${CalendarOps.monthTableSql("noleap")}) cal(m, s0, e0)
                  ON doy0 >= cal.s0 AND doy0 < cal.e0
                WHERE NOT leap),
         u AS (SELECT * FROM jl UNION ALL SELECT * FROM jn)
         SELECT year, month, count(*) AS n, sum(v)::DOUBLE AS sum_v,
                max(day) AS max_day, max(doy) AS max_doy
         FROM u GROUP BY year, month"""
  )
}
