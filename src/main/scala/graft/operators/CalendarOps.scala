package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CF-convention non-Gregorian calendars (the `calendar` attribute of a
  * NetCDF time coordinate): `360_day`, `noleap`/`365_day`,
  * `all_leap`/`366_day`, and `julian` (leap every 4 years, NO century
  * exception — 1900-02-29 exists). Climate-model output commonly ships time
  * as integer "days since &lt;epoch&gt;" under one of these calendars; decoding
  * it with real-calendar logic silently shifts every month boundary.
  *
  * The reference resolves such coordinates through the public `cftime`
  * library (xcube `core/timecoord.py:114` branches on `cftime.datetime`);
  * this implementation re-expresses the fixed-length-calendar arithmetic as
  * pure Column expressions — per-row integer math, no UDF, no shuffle, fully
  * inside whole-stage codegen — so calendar decode can run inline in a scan
  * over billions of rows.
  *
  * The month lookup constants are shared with the DuckDB oracle through
  * [[monthTableSql]], the same single-source-of-constants pattern the UTM
  * series uses.
  */
object CalendarOps {

  /** Days in each month for a calendar year (no leap transitions — these
    * calendars are the same every year, which is the whole point).
    */
  def monthLengths(calendar: String): Seq[Int] = calendar match {
    case "360_day" => Seq.fill(12)(30)
    case "noleap" | "365_day" =>
      Seq(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    case "all_leap" | "366_day" =>
      Seq(31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    case c => throw new IllegalArgumentException(
      s"unsupported CF calendar '$c' (use 360_day, noleap/365_day, all_leap/366_day)")
  }

  /** Zero-based day-of-year at which each month starts; length 13, last
    * element = days per year.
    */
  def monthStarts(calendar: String): Seq[Int] =
    monthLengths(calendar).scanLeft(0)(_ + _)

  def daysPerYear(calendar: String): Int = monthStarts(calendar).last

  /** Parsed CF time-coordinate units ("&lt;unit&gt; since &lt;timestamp&gt;",
    * CF conventions §4.4 / cftime): seconds per unit + epoch in epoch-
    * microseconds. Standard (proleptic-Gregorian) calendar — the CF
    * default; non-Gregorian axes go through [[decode]] instead.
    */
  final case class CfTimeUnits(unitSeconds: Long, epochMicros: Long)

  private val UnitsRe =
    "(?i)^\\s*(seconds?|minutes?|hours?|days?|weeks?)\\s+since\\s+(.+?)\\s*$".r

  def parseCfTimeUnits(units: String): CfTimeUnits = units match {
    case UnitsRe(unit, epoch) =>
      val secs = unit.toLowerCase.stripSuffix("s") match {
        case "second" => 1L
        case "minute" => 60L
        case "hour" => 3600L
        case "day" => 86400L
        case "week" => 604800L
      }
      // "YYYY-M-D[ H:M:S[.f]][Z|±HH[:MM]]" — cftime accepts single-digit
      // fields, a bare date, and a UTC offset, which shifts the epoch
      // (cftime/xarray honor it; swallowing it would move every timestamp
      // by the offset). Anything else after the timestamp is rejected
      // loudly instead of being silently ignored.
      // "Z"/"UTC"/"GMT" suffixes all mean zero offset (udunits accepts the
      // named forms)
      val e = epoch.trim.replaceAll("(?i)\\s*(Z|UTC|GMT)$", "").trim
      val dtRe = ("^(\\d{1,4})-(\\d{1,2})-(\\d{1,2})" +
        "([ T](\\d{1,2}):(\\d{1,2})(:(\\d{1,2})(\\.(\\d+))?)?)?" +
        "\\s*([+-]\\d{1,2}(:?\\d{2})?)?\\s*$").r
      e match {
        case dtRe(y, mo, d, _, h, mi, _, s, _, f, off, _) =>
          val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
            Option(h).map(_.toInt).getOrElse(0),
            Option(mi).map(_.toInt).getOrElse(0),
            Option(s).map(_.toInt).getOrElse(0),
            Option(f).map(x => (x + "000000").take(6).toInt * 1000).getOrElse(0))
          val offSecs = Option(off).map { o =>
            val sign = if (o.startsWith("-")) -1L else 1L
            val digits = o.drop(1).replace(":", "")
            val (hh, mm) =
              if (digits.length <= 2) (digits.toLong, 0L)
              else (digits.dropRight(2).toLong, digits.takeRight(2).toLong)
            require(hh <= 23 && mm <= 59, s"bad UTC offset '$o' in '$units'")
            sign * (hh * 3600L + mm * 60L)
          }.getOrElse(0L)
          // an epoch written at +01:00 is one hour EARLIER in UTC
          CfTimeUnits(secs,
            (ldt.toEpochSecond(java.time.ZoneOffset.UTC) - offSecs) * 1000000L +
              ldt.getNano / 1000L)
        case _ => throw new IllegalArgumentException(
          s"unparseable CF epoch '$epoch' in units '$units'")
      }
    case _ => throw new IllegalArgumentException(
      s"unparseable CF time units '$units' (expect '<unit> since <epoch>')")
  }

  /** Numeric CF time coordinate → TimestampType Column (standard
    * calendar): epoch + value·unit, fractional values kept to the
    * microsecond (xarray decode_cf parity for float axes).
    */
  def cfTimeToTimestamp(value: Column, units: String): Column = {
    val u = parseCfTimeUnits(units)
    timestamp_micros((lit(u.epochMicros) +
      value.cast("double") * (u.unitSeconds * 1000000L)).cast("long"))
  }

  /** Decode integer days-since-epoch (epoch = Jan 1 of `epochYear`) into a
    * struct(year, month, day, doy) — all longs, `month`/`day`/`doy`
    * one-based. Negative day numbers (before the epoch) decode correctly
    * via floor semantics.
    */
  def decode(days: Column, calendar: String, epochYear: Int = 2000): Column = {
    if (calendar == "julian") return decodeJulian(days, epochYear)
    val dpy = daysPerYear(calendar)
    val d = days.cast("long")
    val doy0 = pmod(d, lit(dpy.toLong)) // 0-based day of year, >= 0 always
    // (d - doy0) is an exact multiple of dpy; Column `/` is fractional
    // division, so cast the quotient back to long
    val year = lit(epochYear.toLong) + ((d - doy0) / dpy).cast("long")
    val starts = monthStarts(calendar)
    // month = number of month starts <= doy0 : a 12-arm when-chain the
    // codegen turns into straight-line comparisons
    val month = (1 to 11).reverse.foldLeft(lit(12L)) { (acc, m) =>
      when(doy0 < starts(m), m.toLong).otherwise(acc)
    }
    val startOfMonth = element_at(
      array(starts.take(12).map(s => lit(s.toLong)): _*), month.cast("int"))
    struct(
      year.as("year"),
      month.as("month"),
      (doy0 - startOfMonth + 1L).as("day"),
      (doy0 + 1L).as("doy"))
  }

  /** Inverse of [[decode]]: (year, month, day) → days since Jan 1 of
    * `epochYear` in the given calendar.
    */
  def encode(year: Column, month: Column, day: Column,
             calendar: String, epochYear: Int = 2000): Column = {
    if (calendar == "julian") return encodeJulian(year, month, day, epochYear)
    val starts = monthStarts(calendar)
    val startOfMonth = element_at(
      array(starts.take(12).map(s => lit(s.toLong)): _*), month.cast("int"))
    (year.cast("long") - epochYear) * daysPerYear(calendar) +
      startOfMonth + day.cast("long") - 1L
  }

  /** Julian-calendar decode: days-since-epoch → struct(year, month, day,
    * doy). The julian leap rule is purely mod-4 (reference resolves it via
    * cftime's `DatetimeJulian`, `xcube/core/timecoord.py:33-300`), so the
    * 4-year cycle is a fixed 1461 days: one leap year (366) + three common
    * (365). Same pure-Column integer arithmetic as the fixed calendars —
    * no UDF, stays in whole-stage codegen. `epochYear` must be a julian
    * leap year (a multiple of 4) so cycles anchor on the leap year.
    */
  def decodeJulian(days: Column, epochYear: Int = 2000): Column = {
    require(epochYear % 4 == 0, s"epochYear $epochYear must be a multiple of 4")
    val cyc = 1461L // 366 + 3 * 365
    val d = days.cast("long")
    val r = pmod(d, lit(cyc)) // 0-based day within the 4-year cycle
    val cycle = ((d - r) / cyc).cast("long")
    // year offset in the cycle: year 0 is the leap year
    val yoff = when(r < 366L, lit(0L))
      .otherwise(((r - 366L - pmod(r - 366L, lit(365L))) / 365L).cast("long") + 1L)
    val doy0 = r - when(yoff === 0L, 0L).otherwise(lit(366L) + (yoff - 1L) * 365L)
    val year = lit(epochYear.toLong) + cycle * 4L + yoff
    def monthOf(cal: String): Column = {
      val starts = monthStarts(cal)
      (1 to 11).reverse.foldLeft(lit(12L)) { (acc, m) =>
        when(doy0 < starts(m), m.toLong).otherwise(acc)
      }
    }
    def startOf(cal: String, month: Column): Column = element_at(
      array(monthStarts(cal).take(12).map(s => lit(s.toLong)): _*), month.cast("int"))
    val leap = yoff === 0L
    val month = when(leap, monthOf("all_leap")).otherwise(monthOf("noleap"))
    val som = when(leap, startOf("all_leap", month)).otherwise(startOf("noleap", month))
    struct(
      year.as("year"), month.as("month"),
      (doy0 - som + 1L).as("day"), (doy0 + 1L).as("doy"))
  }

  /** Inverse of [[decodeJulian]]. */
  def encodeJulian(year: Column, month: Column, day: Column,
                   epochYear: Int = 2000): Column = {
    require(epochYear % 4 == 0, s"epochYear $epochYear must be a multiple of 4")
    val yrs = year.cast("long") - epochYear
    val yoff = pmod(yrs, lit(4L))
    val cycle = ((yrs - yoff) / 4L).cast("long")
    def startOf(cal: String): Column = element_at(
      array(monthStarts(cal).take(12).map(s => lit(s.toLong)): _*), month.cast("int"))
    val som = when(yoff === 0L, startOf("all_leap")).otherwise(startOf("noleap"))
    cycle * 1461L +
      when(yoff === 0L, 0L).otherwise(lit(366L) + (yoff - 1L) * 365L) +
      som + day.cast("long") - 1L
  }

  /** A 12-row inline VALUES table `(month, start0, end0)` in 0-based
    * day-of-year, for joining a DuckDB oracle against the SAME constants the
    * Column decode uses: `JOIN (${monthTableSql(cal)}) cal(m, s0, e0) ON doy0
    * >= s0 AND doy0 < e0`.
    */
  def monthTableSql(calendar: String): String = {
    val starts = monthStarts(calendar)
    (1 to 12).map(m => s"(${m}, ${starts(m - 1)}, ${starts(m)})")
      .mkString("VALUES ", ", ", "")
  }
}
