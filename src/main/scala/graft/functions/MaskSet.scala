package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Metadata

/** CF flag-variable expansion into named boolean masks — re-expression of
  * the reference's MaskSet (xcube/core/maskset.py:22-96, mask construction
  * at maskset.py:165-196, bit-spec parsing at maskset.py:269-313).
  *
  * A flag column with metadata `flag_meanings` + `flag_masks` and/or
  * `flag_values` expands to one boolean column per meaning:
  *   masks & values → (v & mask) == value
  *   masks only     → (v & mask) != 0
  *   values only    → v == value
  *
  * All masks are pure bitwise Column arithmetic — codegen'd, no UDF.
  */
object MaskSet {

  final case class FlagSpec(name: String, mask: Option[Long], value: Option[Long])

  /** Parse one flag_masks element: a number, or the reference's bit syntax
    * "5b" (bit 5) / "3b-7b" (bits 3..7 inclusive) — maskset.py:269-313.
    */
  def parseBitSpec(s: String): Long = {
    val t = s.trim
    val range = "(\\d+)b-(\\d+)b".r
    val single = "(\\d+)b".r
    t match {
      case range(a, b) =>
        val (lo, hi) = (a.toInt, b.toInt)
        require(lo <= hi && hi < 64, s"bad bit range '$s'")
        ((lo to hi).map(1L << _)).reduce(_ | _)
      case single(a) => 1L << a.toInt
      // CF numeric attributes surface as float text ("1048576.0") through
      // the attr decode paths — accept both spellings of an integral mask
      case _ => if (t.contains('.')) t.toDouble.toLong else t.toLong
    }
  }

  def flagSpecs(meanings: String, masks: Option[Seq[String]],
                values: Option[Seq[Long]]): Seq[FlagSpec] = {
    val names = meanings.trim.split("\\s+").toSeq
    val ms = masks.map(_.map(parseBitSpec))
    names.zipWithIndex.map { case (n, i) =>
      FlagSpec(n, ms.map(_(i)), values.map(_(i)))
    }
  }

  def maskExpr(flagCol: Column, spec: FlagSpec): Column = (spec.mask, spec.value) match {
    case (Some(m), Some(v)) => flagCol.bitwiseAND(lit(m)) === lit(v)
    case (Some(m), None)    => flagCol.bitwiseAND(lit(m)) =!= lit(0L)
    case (None, Some(v))    => flagCol === lit(v)
    case (None, None)       => lit(false)
  }

  /** Expand a flag column (by its column Metadata) into one boolean column
    * per flag meaning, named `<flagCol>_<meaning>`.
    */
  def expand(df: DataFrame, flagCol: String): DataFrame = {
    val md: Metadata = df.schema(flagCol).metadata
    require(md.contains("flag_meanings"), s"$flagCol has no flag_meanings metadata")
    val masks =
      if (md.contains("flag_masks")) Some(md.getStringArray("flag_masks").toSeq)
      else None
    val values =
      if (md.contains("flag_values")) Some(md.getLongArray("flag_values").toSeq)
      else None
    val specs = flagSpecs(md.getString("flag_meanings"), masks, values)
    specs.foldLeft(df) { (d, s) =>
      d.withColumn(s"${flagCol}_${s.name}", maskExpr(col(flagCol), s))
    }
  }
}
