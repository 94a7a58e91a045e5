package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) — the fixed-memory
  * frequency summary a 100 TB pipeline builds in ONE pass to answer "how
  * often does this URL / shingle / user appear" without materializing the
  * full exact count table. depth×width counters (a few KiB) stand in for a
  * count table whose cardinality is unbounded; estimates only ever
  * OVER-count (est ≥ true, structurally), with error ≤ 2n/width at
  * confidence 1−2^−depth.
  *
  * Scale design: the build is one explode (depth rows per input row) + one
  * map-side-combined count aggregation into at most depth·width counter
  * rows — the counter table is DATA-INDEPENDENT in size, so it broadcasts
  * to the probe no matter how large the corpus was. Probing is `depth`
  * broadcast-hash-join lookups + a `least()` — the probe side is never
  * shuffled (the BloomOps.probe shape).
  *
  * Determinism (engine portability): counter positions use the same
  * Kirsch–Mitzenmacher double-hash walk as BloomOps over the 60-bit md5
  * key hash — pos_i = (h1 + i·h2) AND (width−1), h2 forced odd — all exact
  * long arithmetic any SQL engine reproduces bit-for-bit.
  */
object SketchOps {

  private def position(h: Column, i: Int, width: Long): Column = {
    val wLog2 = java.lang.Long.numberOfTrailingZeros(width)
    val h1 = h.bitwiseAND(lit(width - 1))
    val h2 = shiftright(h, wLog2)
      .bitwiseAND(lit(width / 2 - 1)) * lit(2L) + lit(1L)
    (h1 + h2 * lit(i.toLong)).bitwiseAND(lit(width - 1))
  }

  private def requireShape(width: Long, depth: Int): Unit = {
    require(width >= 16 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 16, got $width")
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
  }

  /** Build the sketch as a (row: int, pos: long, cnt: long) table — one row
    * per non-zero counter (missing counter = 0). One pass over `df`: the
    * posexplode emits `depth` (row, pos) pairs per input row and the count
    * aggregation combines map-side, so the shuffle carries at most
    * depth·width rows per map task regardless of input size.
    */
  def buildCms(df: DataFrame, keyCol: String, width: Long, depth: Int): DataFrame = {
    requireShape(width, depth)
    val h = SampleOps.keyHash(col(keyCol))
    df.select(posexplode(
        array((0 until depth).map(i => position(h, i, width)): _*))
        .as(Seq("row", "pos")))
      .groupBy("row", "pos")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Probe: adds `estCol` = min over the sketch's depth rows of the counter
    * at this key's position — the classic CMS point estimate. `depth`
    * broadcast-hash-join lookups against the (bounded) counter table; the
    * probed side is never shuffled.
    */
  def probeCms(df: DataFrame, keyCol: String, cms: DataFrame, width: Long,
               depth: Int, estCol: String = "est_n"): DataFrame = {
    requireShape(width, depth)
    val withH = df.withColumn("__h", SampleOps.keyHash(col(keyCol)))
    val probed = (0 until depth).foldLeft(withH) { (acc, i) =>
      acc.withColumn(s"__p$i", position(col("__h"), i, width))
        .join(broadcast(cms.filter(col("row") === i)
            .select(col("pos").as(s"__pp$i"), col("cnt").as(s"__c$i"))),
          col(s"__p$i") === col(s"__pp$i"), "left")
    }
    probed
      .withColumn(estCol,
        least((0 until depth).map(i => coalesce(col(s"__c$i"), lit(0L))): _*))
      .drop("__h")
      .drop((0 until depth).flatMap(i => Seq(s"__p$i", s"__pp$i", s"__c$i")): _*)
  }
}
