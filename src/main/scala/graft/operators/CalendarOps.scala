package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CF-convention non-Gregorian calendars (the `calendar` attribute of a
  * NetCDF time coordinate): `360_day`, `noleap`/`365_day`,
  * `all_leap`/`366_day`. Climate-model output commonly ships time as
  * integer "days since &lt;epoch&gt;" under one of these calendars; decoding it
  * with real-calendar logic silently shifts every month boundary.
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

  /** Decode integer days-since-epoch (epoch = Jan 1 of `epochYear`) into a
    * struct(year, month, day, doy) — all longs, `month`/`day`/`doy`
    * one-based. Negative day numbers (before the epoch) decode correctly
    * via floor semantics.
    */
  def decode(days: Column, calendar: String, epochYear: Int = 2000): Column = {
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
    val starts = monthStarts(calendar)
    val startOfMonth = element_at(
      array(starts.take(12).map(s => lit(s.toLong)): _*), month.cast("int"))
    (year.cast("long") - epochYear) * daysPerYear(calendar) +
      startOfMonth + day.cast("long") - 1L
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
