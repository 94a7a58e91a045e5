package graft

import graft.operators.TemporalOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class TemporalOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketStart: fixed freqs are epoch-anchored, calendar freqs truncate") {
    import spark.implicits._
    val df = Seq(ts("2024-01-05 13:00:00"), ts("2024-02-17 00:30:00")).toDF("t")
    val got = df.select(
      TemporalOps.bucketStart(col("t"), "8D").as("d8"),
      TemporalOps.bucketStart(col("t"), "12H").as("h12"),
      TemporalOps.bucketStart(col("t"), "1M").as("m1")).collect()
    // 8-day epoch anchor: floor(19727/8)*8 = 19720 days = 2023-12-29
    assert(got(0).getTimestamp(0) == ts("2023-12-29 00:00:00"))
    assert(got(0).getTimestamp(1) == ts("2024-01-05 12:00:00"))
    assert(got(0).getTimestamp(2) == ts("2024-01-01 00:00:00"))
    assert(got(1).getTimestamp(2) == ts("2024-02-01 00:00:00"))
    intercept[IllegalArgumentException] {
      TemporalOps.bucketStart(col("t"), "3M")
    }
  }

  test("resampleInTime: full method set incl. NaN skipping and arg tiebreak") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 01:00:00"), 1.0),
      (ts("2024-01-01 02:00:00"), 5.0),
      (ts("2024-01-01 03:00:00"), Double.NaN),
      (ts("2024-01-01 04:00:00"), 5.0), // ties max with 02:00 → later wins
      (ts("2024-01-02 01:00:00"), 2.0)
    ).toDF("time", "v")
    val out = TemporalOps.resampleInTime(df, "time", "1D",
      Seq("v" -> "mean", "v" -> "median", "v" -> "count", "v" -> "first",
          "v" -> "last", "v" -> "argmax", "v" -> "std", "v" -> "sum"))
      .orderBy("t").collect()
    val day1 = out(0)
    assert(day1.getAs[Double]("v_mean") == (1.0 + 5.0 + 5.0) / 3) // NaN skipped
    assert(day1.getAs[Double]("v_median") == 5.0)
    assert(day1.getAs[Long]("v_count") == 3L)
    assert(day1.getAs[Double]("v_first") == 1.0)
    assert(day1.getAs[Double]("v_last") == 5.0)
    assert(day1.getAs[Timestamp]("v_argmax") == ts("2024-01-01 04:00:00"))
    assert(day1.getAs[Double]("v_sum") == 11.0)
    assert(out(1).getAs[Double]("v_mean") == 2.0)
  }

  test("ffill/bfill/interpolate over a sparse series") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), Some(10.0)),
      (1, ts("2024-01-02 00:00:00"), None),
      (1, ts("2024-01-03 00:00:00"), None),
      (1, ts("2024-01-04 00:00:00"), Some(40.0)),
      (1, ts("2024-01-05 00:00:00"), None)
    ).toDF("k", "time", "v")
    val f = TemporalOps.ffill(df, Seq("k"), "time", "v", "vf")
    val b = TemporalOps.bfill(f, Seq("k"), "time", "v", "vb")
    val i = TemporalOps.interpolate(b, Seq("k"), "time", "v", "vi",
      t => unix_timestamp(t).cast("double"))
    val rows = i.orderBy("time").collect()
    assert(rows.map(_.getAs[Double]("vf")).toSeq == Seq(10.0, 10.0, 10.0, 40.0, 40.0))
    assert(rows(1).getAs[Double]("vb") == 40.0)
    assert(rows(4).isNullAt(rows(4).fieldIndex("vb"))) // nothing after
    assert(rows(1).getAs[Double]("vi") == 20.0) // 1/3 of the way 10→40
    assert(rows(2).getAs[Double]("vi") == 30.0)
    assert(rows(4).getAs[Double]("vi") == 40.0) // endpoint falls back
  }

  test("nearestFill picks the closer neighbour, respects tolerance, ties->prev") {
    import spark.implicits._
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), Some(10.0)),
      (1, ts("2024-01-02 00:00:00"), None),   // dp=1 dn=2 -> prev
      (1, ts("2024-01-03 00:00:00"), None),   // dp=2 dn=1 -> next
      (1, ts("2024-01-04 00:00:00"), Some(40.0)),
      (1, ts("2024-01-05 00:00:00"), None),   // dp=1 -> prev
      (1, ts("2024-01-09 00:00:00"), None)    // dp=5 > tol -> null
    ).toDF("k", "time", "v")
    val out = TemporalOps.nearestFill(df, Seq("k"), "time", "v", "vn",
      t => unix_timestamp(t).cast("double") / 86400.0, tolerance = Some(2.0))
      .orderBy("time").collect()
    assert(out(1).getDouble(3) == 10.0)
    assert(out(2).getDouble(3) == 40.0)
    assert(out(4).getDouble(3) == 40.0)
    assert(out(5).isNullAt(3))
    // equidistant tie prefers the previous value
    val tie = Seq((1, ts("2024-01-01 00:00:00"), Some(1.0)),
                  (1, ts("2024-01-02 00:00:00"), None),
                  (1, ts("2024-01-03 00:00:00"), Some(3.0))).toDF("k", "time", "v")
    val mid = TemporalOps.nearestFill(tie, Seq("k"), "time", "v", "vn",
      t => unix_timestamp(t).cast("double") / 86400.0)
      .orderBy("time").collect()(1)
    assert(mid.getDouble(3) == 1.0)
  }

  test("CF calendars: decode/encode round-trip, month boundaries, negatives") {
    import graft.operators.CalendarOps
    import spark.implicits._
    for (cal <- Seq("360_day", "noleap", "all_leap")) {
      val dpy = CalendarOps.daysPerYear(cal)
      // every day of a full year, plus a negative stretch before the epoch
      val days = spark.range(-dpy.toLong, 2L * dpy).select(col("id").as("days"))
      val dec = days.select(col("days"),
        CalendarOps.decode(col("days"), cal).as("f"))
      val back = dec.select(col("days"), CalendarOps.encode(
        col("f.year"), col("f.month"), col("f.day"), cal).as("d2"),
        col("f.month").as("m"), col("f.day").as("dom"))
      val rows = back.collect()
      assert(rows.forall(r => r.getLong(0) == r.getLong(1)),
        s"$cal round-trip failed")
      assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 12))
      assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 31))
    }
    // fixed known dates: noleap day 59 = Mar 1 (no Feb 29), 360_day day 59 = Feb 30
    val f365 = Seq(59L).toDF("d")
      .select(CalendarOps.decode(col("d"), "noleap").as("f")).collect()(0).getStruct(0)
    assert(f365.getLong(0) == 2000L && f365.getLong(1) == 3L && f365.getLong(2) == 1L)
    val f360 = Seq(59L).toDF("d")
      .select(CalendarOps.decode(col("d"), "360_day").as("f")).collect()(0).getStruct(0)
    assert(f360.getLong(0) == 2000L && f360.getLong(1) == 2L && f360.getLong(2) == 30L)
    // all_leap keeps Feb 29: day 59 = Feb 29
    val f366 = Seq(59L).toDF("d")
      .select(CalendarOps.decode(col("d"), "all_leap").as("f")).collect()(0).getStruct(0)
    assert(f366.getLong(1) == 2L && f366.getLong(2) == 29L)
    // day before the epoch is Dec 31/30 of epochYear-1
    val neg = Seq(-1L).toDF("d")
      .select(CalendarOps.decode(col("d"), "noleap").as("f")).collect()(0).getStruct(0)
    assert(neg.getLong(0) == 1999L && neg.getLong(1) == 12L && neg.getLong(2) == 31L)
  }

  test("CF time units parse and convert numeric axes to timestamps") {
    import graft.operators.CalendarOps
    import spark.implicits._
    val u = CalendarOps.parseCfTimeUnits("days since 2000-01-01")
    assert(u.unitSeconds == 86400L)
    assert(u.epochMicros ==
      java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime * 1000L -
        java.util.TimeZone.getDefault.getOffset(
          java.sql.Timestamp.valueOf("2000-01-01 00:00:00").getTime) * 1000L)
    // hours + time-of-day epoch, case-insensitive, single-digit fields
    val h = CalendarOps.parseCfTimeUnits("Hours since 1970-1-1 6:30:00")
    assert(h.unitSeconds == 3600L && h.epochMicros == 23400L * 1000000L)
    // column conversion incl. fractional values
    val out = Seq(0.0, 1.5, -2.0).toDF("t")
      .select(CalendarOps.cfTimeToTimestamp(col("t"),
        "days since 2000-01-01").cast("string").as("ts"))
      .collect().map(_.getString(0))
    assert(out(0).startsWith("2000-01-01 00:00"))
    assert(out(1).startsWith("2000-01-02 12:00"))
    assert(out(2).startsWith("1999-12-30 00:00"))
    intercept[IllegalArgumentException](
      CalendarOps.parseCfTimeUnits("fortnights since 2000-01-01"))
    intercept[IllegalArgumentException](
      CalendarOps.parseCfTimeUnits("days since the dawn of time"))
    // a UTC offset on the epoch shifts it (cftime/xarray honor it): an
    // epoch at +01:00 is one hour EARLIER in UTC
    val z = CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00")
    val p1 = CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00+01:00")
    assert(p1.epochMicros == z.epochMicros - 3600L * 1000000L)
    val m530 = CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00-05:30")
    assert(m530.epochMicros == z.epochMicros + (5 * 3600L + 1800L) * 1000000L)
    // bare-hours and compact forms
    assert(CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00+01")
      .epochMicros == p1.epochMicros)
    assert(CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00+0100")
      .epochMicros == p1.epochMicros)
    // explicit Z / named-UTC suffixes and a trailing-garbage rejection
    assert(CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00Z")
      .epochMicros == z.epochMicros)
    assert(CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00 UTC")
      .epochMicros == z.epochMicros)
    intercept[IllegalArgumentException](
      CalendarOps.parseCfTimeUnits("hours since 2000-01-01 00:00:00 junk"))
  }

  test("julian calendar decodes against the JVM's pure-julian GregorianCalendar") {
    import graft.operators.CalendarOps
    import spark.implicits._
    // round-trip across 3 cycles either side of the epoch
    val days = spark.range(-4400L, 4400L).select(col("id").as("days"))
    val dec = days.select(col("days"), CalendarOps.decode(col("days"), "julian").as("f"))
    val rows = dec.select(col("days"), CalendarOps.encode(
        col("f.year"), col("f.month"), col("f.day"), "julian").as("d2"),
        col("f.year"), col("f.month"), col("f.day")).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)), "julian round-trip")
    // independent oracle: a GregorianCalendar with the gregorian changeover
    // pushed to +infinity IS the proleptic julian calendar
    val jul = new java.util.GregorianCalendar(
      java.util.TimeZone.getTimeZone("UTC"))
    jul.setGregorianChange(new java.util.Date(Long.MaxValue))
    jul.clear(); jul.set(2000, 0, 1)
    val epochMs = jul.getTimeInMillis
    rows.foreach { r =>
      val g = jul.clone().asInstanceOf[java.util.GregorianCalendar]
      g.setTimeInMillis(epochMs + r.getLong(0) * 86400000L)
      assert(r.getLong(2) == g.get(java.util.Calendar.YEAR)
        && r.getLong(3) == g.get(java.util.Calendar.MONTH) + 1
        && r.getLong(4) == g.get(java.util.Calendar.DAY_OF_MONTH),
        s"julian day ${r.getLong(0)}: got (${r.getLong(2)},${r.getLong(3)},${r.getLong(4)})")
    }
    // 1900 IS a julian leap year (no century exception): Feb 29 exists
    val d1900 = Seq((1900L, 2L, 29L)).toDF("y", "m", "dd")
      .select(CalendarOps.encode(col("y"), col("m"), col("dd"), "julian").as("d"))
      .collect()(0).getLong(0)
    val back1900 = Seq(d1900).toDF("d")
      .select(CalendarOps.decode(col("d"), "julian").as("f")).collect()(0).getStruct(0)
    assert(back1900.getLong(0) == 1900L && back1900.getLong(1) == 2L
      && back1900.getLong(2) == 29L)
  }
}
