package graft.sources.zarr

import graft.sources.ZarrSource

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Offset = how many leading-dimension slices of the group exist. Zarr
  * append-streams grow dim 0 ([[ZarrSource.appendCube]] extends the time
  * dimension in place and rewrites `.zarray` shape), so "new data" is
  * exactly the slice index range [committed, current). */
final case class ZarrOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** `spark.readStream.format("zarr").load(group)` — the streaming READ
  * half of the connector, the relational form of the reference's dataset
  * polling (`webapi` auto-reload / `server/helpers.py` observers): each
  * micro-batch emits the time slices appended to the group since the last
  * committed offset, as ordinary rows.
  *
  * Contract and scale shape:
  *  - `latestOffset` is one metadata read (the lead variable's `.zarray`
  *    shape[0]) per poll — no listing, no payload IO;
  *  - `planInputPartitions(start, end)` RE-OPENS the group (metadata +
  *    driver-sized coordinates, which grew with the append) and plans one
  *    task per chunk intersecting the new slice range; a boundary chunk
  *    shared with already-emitted slices is re-read but its rows are
  *    range-filtered in the reader, so emission is exactly-once per slice;
  *  - pushed dimension predicates prune the non-streaming dims exactly as
  *    in the batch scan;
  *  - recovery is Spark's own checkpoint/offset machinery — the offset is
  *    a plain slice count, so a restarted query resumes where it stopped
  *    regardless of how much the group grew meanwhile.
  *
  * v2 local/object/http groups only: v3 and refs-backed (kerchunk) tables
  * reject loudly — append-in-place is a v2 store operation here.
  */
final class ZarrMicroBatchStream(meta: ZarrGroupMeta, consumed: Array[Filter],
                                 required: StructType,
                                 maxSlicesPerTrigger: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(!meta.v3 && meta.refs.isEmpty,
    s"${meta.groupDir}: streaming zarr reads support v2 groups only " +
      "(v3/kerchunk-backed tables are batch sources)")

  private def currentSlices(): Long = {
    // fresh metadata, one read: the lead data variable's dim-0 extent
    val za = ZarrSource.openArray(s"${meta.groupDir}/${meta.dataVars.head}")
    za.shape.head.toLong
  }

  override def initialOffset(): Offset = ZarrOffset(0L)
  override def latestOffset(): Offset = ZarrOffset(currentSlices())
  override def deserializeOffset(json: String): Offset =
    ZarrOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // ---- admission control: `.option("maxSlicesPerTrigger", n)` bounds a
  // micro-batch to n dim-0 slices. A restarted query that fell far behind
  // a 100 TB append stream otherwise plans ONE batch over the whole
  // backlog — bounded batches keep task counts, shuffle sizes and commit
  // latency flat while Spark drains the backlog batch by batch.
  // SupportsTriggerAvailableNow makes the rate limit effective under
  // Trigger.AvailableNow too (without it Spark falls back to one
  // all-available batch): the trigger pins the target offset up front
  // and the query runs ceil(backlog / n) bounded batches to reach it.
  override def getDefaultReadLimit: ReadLimit =
    maxSlicesPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = Some(currentSlices())
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ZarrOffset].n
    val cur = availableNowTarget.getOrElse(currentSlices())
    def cap(l: ReadLimit): Long = l match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        math.min(cur, s + r.maxRows)
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.map(cap).min
      case _ => cur
    }
    ZarrOffset(cap(limit))
  }

  override def reportLatestOffset(): Offset = ZarrOffset(currentSlices())

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ZarrOffset].n
    val e = end.asInstanceOf[ZarrOffset].n
    if (e <= s) return Array.empty
    // re-open: shapes and the dim-0 coordinate array grew with the append
    val fresh = ZarrTable.open(meta.groupDir)
    val za = fresh.za
    require(e <= za.shape.head,
      s"${meta.groupDir}: offset $e beyond current dim-0 extent ${za.shape.head}")
    // inlineShared: the stream's reader factory is created ONCE, but an
    // append grows the coordinate arrays batch over batch — each batch's
    // partitions carry their own (small) copy of the fresh scan state
    ZarrScan.plannedPartitions(fresh, consumed, Array.empty, required,
      dim0Range = Some((s, e)), inlineShared = true)
  }

  // the batch reader factory IS the streaming one — readers are
  // identical, the partition carries the slice range
  override def createReaderFactory(): PartitionReaderFactory =
    ZarrReaderFactory()
}
