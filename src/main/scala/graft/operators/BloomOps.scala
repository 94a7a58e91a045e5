package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter blocklist membership for training-data pipelines — the
  * standard shape for "drop every document whose URL / fingerprint is on
  * a banned list" when the list is too big to equi-join cheaply but its
  * BITMAP fits a broadcast (10^10 entries ≈ 1–2 GiB at 10 bits/key).
  *
  * Scale design: building the bitmap is one explode + one map-side-
  * combined `bit_or` aggregation over (key → k bit positions); the result
  * is an (m/64)-row (word_idx, word) table that BROADCASTS to the probe
  * join, so probing is scan + broadcast-hash-join + one map-side count
  * aggregation — the corpus is never shuffled, and the blocklist is
  * touched once. A Bloom hit is "possibly blocked" (false positives at
  * the standard (1−e^{−kn/m})^k rate, zero false negatives); exact
  * pipelines follow the hit set with an equi-join against the real list,
  * which the probe has already shrunk by orders of magnitude.
  *
  * Determinism (the engine-portability discipline of SampleOps): bit
  * positions come from Kirsch–Mitzenmacher double hashing over the 60-bit
  * md5 hash — `pos_i = (h1 + i·h2) AND (m−1)` with m a power of two,
  * h1 = h AND (m−1), h2 forced odd — all exact long arithmetic any SQL
  * engine reproduces bit-for-bit (no float, no overflow: i·h2 < k·m).
  */
object BloomOps {

  /** The i-th bit position of `key` (Kirsch–Mitzenmacher; `mBits` must be
    * a power of two). h2 is forced odd, so (h1 + i·h2) walks a full-period
    * progression modulo the power-of-two m.
    */
  private def position(h: Column, i: Int, mBits: Long): Column = {
    // shifts, not division: h is a 60-bit value, and long/long division
    // routes through double (2^53 mantissa) in Spark SQL
    val mLog2 = java.lang.Long.numberOfTrailingZeros(mBits)
    val h1 = h.bitwiseAND(lit(mBits - 1))
    val h2 = shiftright(h, mLog2)
      .bitwiseAND(lit(mBits / 2 - 1)) * lit(2L) + lit(1L)
    (h1 + h2 * lit(i.toLong)).bitwiseAND(lit(mBits - 1))
  }

  /** All k bit positions of an ALREADY-HASHED key value. */
  private def positionsArray(h: Column, mBits: Long, k: Int): Column =
    array((0 until k).map(i => position(h, i, mBits)): _*)

  private def requirePow2(mBits: Long): Unit =
    require(mBits >= 128 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 128, got $mBits")

  /** Build the bitmap as an (word_idx: long, word: long) table — one row
    * per 32-BIT word that has at least one bit set (missing word = 0).
    * Words are 32-bit values carried in longs: bit index ≤ 31 keeps every
    * mask positive, which any SQL engine's plain integer `<<` and
    * `bit_or` reproduce (a 63-bit shift overflows signed 64-bit SQL).
    */
  /** The default key hash is the md5-derived 60-bit [[SampleOps.keyHash]]
    * (engine-portable — the form every oracle-rebuilt bitmap needs). For
    * probe paths whose RESULT is hash-independent (a Bloom prefilter
    * before an exact join has zero false negatives under ANY hash
    * family), pass [[fastHash]] instead: native codegen xxhash64, ~20×
    * cheaper per row than the md5/conv chain.
    */
  def fastHash(c: Column): Column =
    xxhash64(c).bitwiseAND(lit(0x0fffffffffffffffL))

  def buildBitmap(blocklist: DataFrame, keyCol: String, mBits: Long,
                  k: Int,
                  hash: Column => Column = SampleOps.keyHash): DataFrame = {
    requirePow2(mBits)
    require(k >= 1 && k <= 16, s"k hash functions out of range: $k")
    blocklist
      .select(explode(positionsArray(hash(col(keyCol)), mBits, k)).as("__pos"))
      .select(shiftright(col("__pos"), 5).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))").as("__bit"))
      .groupBy("word_idx")
      .agg(bit_or(col("__bit")).as("word"))
  }

  /** Inline-bitmap probe: the whole bitmap rides into the scan as ONE
    * literal word array (m/32 entries) — zero joins, the k bit checks are
    * scalar expressions inside whole-stage codegen. The right shape while
    * the bitmap is comfortably task-sized (m ≤ 2^26 bits = 8 MiB of
    * words); beyond that the [[probe]] broadcast-join form takes over
    * (the 10^10-key blocklists the scaladoc sizes). Measured: the 5-join
    * chain costs ~1 s per 600k-row stage at k=5; this form reduces the
    * whole probe to the key-hash cost.
    */
  def probeInline(df: DataFrame, keyCol: String, bitmap: DataFrame,
                  mBits: Long, k: Int,
                  bloomCol: String = "bloom_hit",
                  hash: Column => Column = SampleOps.keyHash): DataFrame = {
    requirePow2(mBits)
    require(k >= 1 && k <= 16, s"k hash functions out of range: $k")
    require(mBits <= (1L << 26),
      s"inline probe caps at 2^26 bits, got $mBits — use probe()")
    // EAGER at query-construction time: the bitmap materializes here on
    // the driver (m/32 rows — bounded by the 2^26-bit cap above, ≤ 8 MiB).
    // Callers composing lazy plans should build the bitmap once and reuse
    // the returned plan, not re-call probeInline per run.
    val nWords = (mBits / 32).toInt
    val words = new Array[Long](nWords)
    bitmap.collect().foreach { r =>
      val w = r.getLong(0)
      // a bitmap built for a DIFFERENT mBits would scatter silently or
      // throw a bare AIOOBE here — name the mismatch instead
      require(w >= 0 && w < nWords,
        s"bitmap word_idx $w outside [0, $nWords) — bitmap built with a " +
          s"different mBits than the probe's $mBits")
      words(w.toInt) = r.getLong(1)
    }
    val arr = typedLit(words.toSeq)
    var cur = df.withColumn("__h", hash(col(keyCol)))
      .withColumn("__bm", arr)
    val hitCols = (0 until k).map { i =>
      cur = cur.withColumn(s"__p$i", position(col("__h"), i, mBits))
      expr(s"(shiftleft(CAST(1 AS BIGINT), CAST(__p$i % 32 AS INT)) & " +
        s"element_at(__bm, CAST((__p$i div 32) + 1 AS INT))) != 0")
    }
    cur.withColumn(bloomCol, hitCols.reduce(_ && _))
      .drop("__h", "__bm")
      .drop((0 until k).map(i => s"__p$i"): _*)
  }

  /** Probe: adds a boolean `bloomCol` to `df` — true iff ALL k bits of
    * `keyCol` are set (possibly blocked; false = definitely not blocked).
    *
    * Shape: k broadcast-hash-join lookups against the bitmap table — the
    * streamed corpus side is NEVER shuffled (no explode + re-group, which
    * would re-aggregate the whole input just to fold k probe rows back).
    * Each join is a per-row hash-map lookup inside one codegen stage.
    */
  def probe(df: DataFrame, keyCol: String, bitmap: DataFrame, mBits: Long,
            k: Int, bloomCol: String = "bloom_hit"): DataFrame = {
    requirePow2(mBits)
    require(k >= 1 && k <= 16, s"k hash functions out of range: $k")
    val withH = df.withColumn("__h", SampleOps.keyHash(col(keyCol)))
    val probed = (0 until k).foldLeft(withH) { (acc, i) =>
      val pos = position(col("__h"), i, mBits)
      acc.withColumn(s"__p$i", pos)
        .withColumn(s"__w$i", shiftright(col(s"__p$i"), 5))
        .join(broadcast(bitmap.select(col("word_idx").as(s"__wi$i"),
          col("word").as(s"__word$i"))),
          col(s"__w$i") === col(s"__wi$i"), "left")
        .withColumn(s"__hit$i",
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__p$i % 32 AS INT))")
            .bitwiseAND(coalesce(col(s"__word$i"), lit(0L))) =!= 0L)
    }
    probed
      .withColumn(bloomCol, (0 until k).map(i => col(s"__hit$i")).reduce(_ && _))
      .drop("__h")
      .drop((0 until k).flatMap(i =>
        Seq(s"__p$i", s"__w$i", s"__wi$i", s"__word$i", s"__hit$i")): _*)
  }
}
