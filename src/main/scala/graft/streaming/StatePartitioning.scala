package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle/state partitioning for STREAMING queries.
  *
  * A stateful streaming query pins its state-store partition count to
  * `spark.sql.shuffle.partitions` at first start, and AQE cannot coalesce
  * it afterwards (AQE is disabled in stateful workloads). With the static
  * local default (= core count) a small replay pays the fixed per-store
  * cost — open + commit + delta-file fsync for every (partition × store)
  * instance per micro-batch — on near-empty stores: the r20 probe measured
  * q_stream_join at 19.9 s wall with 32 state partitions (128 store
  * instances, ~107 s summed commit time in batch 0) vs 6.4 s with 4, with
  * identical results.
  *
  * So the partition count is derived from the stream's INPUT SIZE before
  * the query starts — the same sizing rule AQE applies to batch shuffles
  * (`advisoryPartitionSizeInBytes`), applied at plan time because runtime
  * coalescing is unavailable for stateful stages:
  *
  *   n = clamp(ceil(inputBytes / advisory), floor, configured shuffle.partitions)
  *
  * The configured count stays the CEILING: on a real cluster a 100 TB
  * replay saturates it and behaves exactly as before — this only sizes
  * DOWN when the input provably cannot fill the static count, never up.
  * An input that cannot be sized (unreachable filesystem, missing path)
  * counts as unbounded, so the derivation fails safe to the ceiling, never
  * the floor. The default floor is [[MinPartitions]] (8); the stream-stream
  * join passes 4 (see [[derivedPartitions]]). The floor keeps CPU-dense
  * stateful stages (per-row hashing, signature folds) off a single core
  * even for byte-tiny inputs.
  *
  * Returns a config-twin session ([[org.apache.spark.sql.graft.ConfBridge]])
  * carrying the derived count; the caller must build the stream AND read
  * the memory-sink table through it.
  */
object StatePartitioning {

  /** Floor for the derived count — parallelism for CPU-dense stateful
    * stages on small inputs (never above the configured count). Measured
    * on the r20 streaming family: 8 beats 4 for the per-row-CPU stateful
    * aggregations (flatMapGroupsWithState folds, CMS/top-k updates) and
    * beats 32 everywhere the state is small.
    */
  val MinPartitions = 8

  /** Total bytes under `paths`, resolved through the Hadoop filesystem of
    * each path's scheme (so hdfs://, s3a:// etc. are sized for real, not
    * as 0 bytes the way a java.io.File walk would report them). Any path
    * that cannot be sized — missing, or on an unreachable/unknown
    * filesystem — counts as [[Long.MaxValue]]: the derivation then fails
    * SAFE to the configured partition count (the pre-derivation behaviour),
    * never to the floor.
    */
  def inputBytes(spark: SparkSession, paths: Seq[String]): Long = {
    val hconf = spark.sessionState.newHadoopConf()
    paths.foldLeft(0L) { (acc, p) =>
      val size =
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(hconf).getContentSummary(hp).getLength
        } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
      if (acc == Long.MaxValue || size == Long.MaxValue ||
        acc + size < 0) Long.MaxValue
      else acc + size
    }
  }

  /** The derived partition count for `bytes` of input under `spark`'s
    * advisory partition size, capped at its configured shuffle partitions.
    * `floor` defaults to [[MinPartitions]]; a stream-stream join should
    * pass a lower one because it opens FOUR state stores per partition
    * (two keyToNumValues + two keyWithIndexToValue), so its per-partition
    * fixed commit cost is ~4x an aggregation's — the r20 probe measured
    * the interval join at 2.7 s wall with 4 partitions vs 4.0 s with 8
    * vs 16 s with 32 (summed store commit 0.8 s / 4.8 s / 131 s).
    */
  def derivedPartitions(spark: SparkSession, bytes: Long,
      floor: Int = MinPartitions): Int = {
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m"))
    val bySize = math.ceil(bytes.toDouble / math.max(advisory, 1L)).toLong
    math.min(conf.toLong, math.max(math.min(floor, conf).toLong,
      bySize)).toInt
  }

  /** The session a streaming query over `paths` should start from: `spark`
    * itself when the derived count equals the configured one, else the
    * cached config twin with `spark.sql.shuffle.partitions` overridden.
    */
  def sessionFor(spark: SparkSession, paths: String*): SparkSession =
    sessionForFloor(spark, MinPartitions, paths: _*)

  /** [[sessionFor]] with an explicit floor — see [[derivedPartitions]]. */
  def sessionForFloor(spark: SparkSession, floor: Int,
      paths: String*): SparkSession =
    sessionForFloorWith(spark, floor, Map.empty, paths: _*)

  /** Conf overrides every replay twin carries in addition to the derived
    * partition count.
    *
    * noDataMicroBatches OFF: after the data batch, AvailableNow ran one
    * more NO-DATA micro-batch whose only job is advancing the watermark
    * and evicting state — it re-executes the whole physical plan on empty
    * input (probed at 0.3–0.7 s per query on this host: q_stream_join's
    * empty batch cost 0.73 s of a 2.56 s pass). None of the declared
    * replays emit on watermark advance: the flatMapGroupsWithState
    * operators are Update-mode with NoTimeout (emissions happen in the
    * data batch; no timeout flush), the aggregations are Update/Complete
    * mode (updated keys / full state emitted in the data batch), the
    * stream-stream join is INNER (matches emit where they join) and
    * dropDuplicatesWithinWatermark emits first occurrences immediately —
    * so skipping the empty batch leaves every sink byte-identical
    * (oracle-gated per query). A query whose FINAL emission needs the
    * watermark advance (e.g. an append-mode windowed aggregation) must
    * not start from these twins.
    */
  val ReplayConfs: Map[String, String] =
    Map("spark.sql.streaming.noDataMicroBatches.enabled" -> "false")

  /** [[sessionForFloor]] with extra query-scoped conf overrides carried by
    * the same twin (one cached twin per distinct conf map — see
    * ConfBridge). The twin is returned even when the derived partition
    * count equals the configured one, so [[ReplayConfs]] and the extra
    * overrides always apply without mutating the parent session.
    */
  def sessionForFloorWith(spark: SparkSession, floor: Int,
      extra: Map[String, String], paths: String*): SparkSession = {
    val n = derivedPartitions(spark, inputBytes(spark, paths), floor)
    val overrides = ReplayConfs ++ extra ++
      (if (n == spark.conf.get("spark.sql.shuffle.partitions").toInt) Map.empty
       else Map("spark.sql.shuffle.partitions" -> n.toString))
    org.apache.spark.sql.graft.ConfBridge.twinSession(spark, overrides)
  }
}
