package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and bucketized
  * range (interval) join. Both are implemented in the shape that survives
  * 100 TB — no per-row range probe ever becomes a nested-loop join.
  *
  * As-of: the classic "latest snapshot at or before each observation"
  * (sensor calibration at measurement time, price at trade time). A naive
  * `left JOIN right ON key AND rts <= lts` + max explodes quadratically per
  * key; the union-window form below is one shuffle + one per-partition sort,
  * linear in (|left| + |right|).
  *
  * Range: "which interval contains this point" (maintenance windows,
  * validity periods). Spark plans an inequality-only join as
  * BroadcastNestedLoopJoin — O(points × intervals). Bucketizing both sides
  * by a coarse grid turns it into an equi-join on the bucket id, with each
  * interval replicated only into the buckets it overlaps (bounded by
  * interval-length / bucketWidth + 1).
  */
object JoinOps {

  /** Backward as-of join: for every left row, attach `valueCol` from the
    * latest right row with the same `keys` and `rightTime <= leftTime`
    * (inclusive, like pandas merge_asof and DuckDB ASOF JOIN). Left rows
    * with no prior right row keep a null value. `tolerance` (seconds, on
    * timestamp columns) nulls matches older than the bound.
    *
    * Plan shape: union → ONE window (partition by keys, order by time) with
    * `last(ignoreNulls)` running state → filter. No join node at all; right
    * rows and left rows co-shuffle once on the keys.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCol: String, asofCol: String = "asof_value",
               matchedTimeCol: String = "asof_time",
               toleranceSec: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    // side 0 sorts BEFORE side 1 at equal timestamps → a right row with
    // rts == lts is visible to that left row (inclusive semantics)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        col(valueCol).as("__v"), col(rightTime).as("__rt")): _*)
    val l = left.select(
      col("*"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(r.schema("__v").dataType).as("__v"),
      lit(null).cast(r.schema("__rt").dataType).as("__rt"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // (__t, __side, __v) ordering: the trailing __v is a tiebreaker so that
    // when several right rows share a key and timestamp the attached row is
    // deterministic across runs/partitionings (the max value wins).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry (time, value) as ONE struct through a single last(ignoreNulls):
    // the struct is non-null for every right row even when its value is NULL,
    // so the latest right row always wins and its NULL value propagates —
    // matching pandas merge_asof / DuckDB ASOF — and the matched time can
    // never come from a different row than the value.
    val matched = unioned
      .withColumn("__m", last(
        when(col("__side") === 0, struct(col("__rt").as("t"), col("__v").as("v"))),
        ignoreNulls = true).over(w))
      .withColumn("__av", col("__m").getField("v"))
      .withColumn("__at", col("__m").getField("t"))
      .filter(col("__side") === 1)
    val inTol = toleranceSec match {
      case Some(tol) =>
        unix_timestamp(col("__t")) - unix_timestamp(col("__at")) <= tol
      case None => lit(true)
    }
    matched.select(
      leftCols.map(col) ++ Seq(
        when(inTol, col("__av")).as(asofCol),
        when(inTol, col("__at")).as(matchedTimeCol)): _*)
  }

  /** Bucketized interval join: pairs every left row whose numeric `pointCol`
    * falls in [startCol, endCol) of an interval row. All three expressions
    * must share one unit (e.g. epoch microseconds via `unix_micros`);
    * `bucketWidth` is in that unit. Both sides are mapped onto the bucket
    * grid; intervals are exploded into every grid cell they overlap, then an
    * EQUI-join on the cell id + exact containment filter gives the result —
    * never a nested-loop join (plan-asserted in PlanAuditSpec).
    *
    * Choose `bucketWidth` near the typical interval length: replication
    * factor is len/width + 1 per interval, and cell population bounds the
    * per-task match work.
    */
  def rangeJoin(points: DataFrame, pointCol: Column,
                intervals: DataFrame, startCol: Column, endCol: Column,
                bucketWidth: Long): DataFrame = {
    val pb = points.withColumn("__p", pointCol.cast("long"))
      .withColumn("__bucket", floor(col("__p") / bucketWidth))
    val ib = intervals
      .withColumn("__s", startCol.cast("long"))
      .withColumn("__e", endCol.cast("long"))
      .filter(col("__e") > col("__s"))
      .withColumn("__bucket",
        explode(sequence(floor(col("__s") / bucketWidth),
          // end is exclusive: a bucket starting exactly at __e holds nothing
          floor((col("__e") - 1) / bucketWidth))))
    pb.join(ib, Seq("__bucket"))
      .filter(col("__p") >= col("__s") && col("__p") < col("__e"))
      .drop("__bucket", "__p", "__s", "__e")
  }
}
