package graft

import graft.operators.JoinOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: latest prior snapshot, inclusive ties, tolerance, unmatched") {
    import spark.implicits._
    val left = Seq(
      (1, ts("2024-01-01 10:00:00")), // before any snapshot → null
      (1, ts("2024-01-01 12:00:00")), // equal to snapshot ts → inclusive match
      (1, ts("2024-01-01 15:30:00")), // between snapshots → 12:00 one
      (1, ts("2024-01-02 09:00:00")), // after both → 18:00 one
      (2, ts("2024-01-01 12:00:00"))  // other key, no snapshots → null
    ).toDF("k", "t")
    val right = Seq(
      (1, ts("2024-01-01 12:00:00"), 10.0),
      (1, ts("2024-01-01 18:00:00"), 20.0)
    ).toDF("k", "rt", "v")
    val out = JoinOps.asofJoin(left, right, Seq("k"), "t", "rt", "v")
      .orderBy("k", "t").collect()
    assert(out.map(r => Option(r.get(2))).toSeq ==
      Seq(None, Some(10.0), Some(10.0), Some(20.0), None))
    // tolerance: 15:30 is 3.5h after 12:00 — a 2h tolerance nulls it,
    // the others stay (12:00 exact = 0s, 09:00 next day vs 18:00 = 15h → null too)
    val tol = JoinOps.asofJoin(left, right, Seq("k"), "t", "rt", "v",
        toleranceSec = Some(2 * 3600L))
      .orderBy("k", "t").collect()
    assert(tol.map(r => Option(r.get(2))).toSeq ==
      Seq(None, Some(10.0), None, None, None))
  }

  test("rangeJoin: [start, end) semantics and intervals spanning buckets") {
    import spark.implicits._
    val points = Seq(5L, 10L, 99L, 100L, 250L, 300L).toDF("p")
    val ivals = Seq((1L, 10L, 100L), (2L, 90L, 260L)).toDF("id", "s", "e")
    // bucket width 64 forces both intervals across multiple grid cells
    val out = JoinOps.rangeJoin(points, col("p"), ivals, col("s"), col("e"), 64L)
      .select(col("p"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set(
      (10L, 1L), (99L, 1L),            // start inclusive, 100 excluded
      (99L, 2L), (100L, 2L), (250L, 2L) // 260 end excludes 300; 90 <= 99
    ))
    // empty/invalid intervals (e <= s) match nothing
    val bad = Seq((3L, 50L, 50L)).toDF("id", "s", "e")
    assert(JoinOps.rangeJoin(points, col("p"), bad, col("s"), col("e"), 64L).isEmpty)
  }
}
