package graft.sources.zarr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** PARTIAL aggregate pushdown over data variables — the companion to
  * [[ZarrAggScan]]'s metadata-only complete pushdown. When a query
  * aggregates actual cell values (`min(v)`, `sum(v)`, grouped by dims),
  * the chunks must be read — but nothing obliges the scan to stream every
  * cell through the whole-stage pipeline just to fold it into a handful
  * of partial states. This scan computes the per-chunk partial aggregate
  * INSIDE the partition reader (one pass over the decoded chunk, group
  * states bounded by the chunk's own cell count) and emits one row per
  * (chunk, group); Spark's final aggregation merges them. At 100 TB the
  * exchange above the scan carries O(chunks × groups) rows instead of
  * O(cells) — for a global `avg(v)` over a 10^7-chunk archive that is
  * 10^7 partial rows versus 10^13 cells, with chunk pruning from pushed
  * dimension predicates still applied first.
  *
  * Semantics match Spark's own partial aggregation exactly: cells are
  * never null (missing chunks decode to the fill value), Count/CountStar
  * therefore count cells, Sum is plain double addition in cell order
  * (the same order the row scan would feed Spark's partial agg), and
  * Min/Max use `java.lang.Double.compare` ordering — NaN greatest,
  * -0.0 < 0.0 — which is Spark's DoubleType ordering. Group keys
  * normalize -0.0 to 0.0 and canonicalize NaN bits, mirroring Spark's
  * grouping-key normalization (reference behavior: xarray reductions in
  * resample/agg paths, core/gridmapping + core/resampling; here the
  * shape is Spark-first — the optimizer chooses the pushdown, the scan
  * only honors it).
  *
  * The reference analog is dask's blockwise tree-reduction over chunked
  * arrays (`dataset.mean()` folds each chunk before any inter-worker
  * communication); this is that behavior surfaced through Catalyst so ANY
  * relational aggregate over the cube — SQL included — gets chunk-local
  * folding for free, across every connector that shares this scan engine
  * (zarr v2/v3, netcdf, geotiff, kerchunk archives).
  */
final case class ZarrVarAggScan(meta: ZarrGroupMeta, consumed: Array[Filter],
                                agg: Aggregation,
                                schema: StructType, groupDims: Seq[String])
    extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ZarrVarAggScan ${meta.groupDir} GroupBy: [${groupDims.mkString(", ")}] " +
      "PushedAggregates: [" +
      agg.aggregateExpressions.map(_.toString).mkString(", ") + "], " +
      s"PushedFilters: [${consumed.map(_.toString).mkString(", ")}]"

  /** The inner cell scan reads dims first, then exactly the data vars the
    * aggregates touch (variable pruning still applies: `sum(v1)` over a
    * 40-variable group decodes one variable). */
  private[zarr] def innerRequired: StructType = {
    val cols = innerCols
    StructType(ZarrTable.schemaFor(meta).fields
      .filter(f => cols.contains(f.name)))
  }

  private def innerCols: Seq[String] = {
    val vars = agg.aggregateExpressions.toSeq.flatMap {
      case c: Count => ZarrVarAggScan.colName(meta, c.column)
      case m: Min => ZarrVarAggScan.colName(meta, m.column)
      case m: Max => ZarrVarAggScan.colName(meta, m.column)
      case s: Sum => ZarrVarAggScan.colName(meta, s.column)
      case _ => None
    }.filter(meta.dataVars.contains).distinct
    meta.za.dims ++ vars
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val required = innerRequired
    // index group keys and aggregated columns against the INNER SCHEMA's
    // field order — the order the chunk cursor actually emits (schemaFor
    // keeps dims first, then dataVars in their SORTED resolution order),
    // NOT the aggregate-appearance order of innerCols: binding against
    // appearance order silently swaps variables when a query aggregates
    // 2+ data vars out of alphabetical order (e.g. agg(sum("w"), sum("v")))
    val names = required.fieldNames.toSeq
    val groupIdx = groupDims.map(names.indexOf).toArray
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => ZarrAggSpec(ZarrAggSpec.CountStar, -1)
      case c: Count =>
        ZarrAggSpec(ZarrAggSpec.Count,
          names.indexOf(ZarrVarAggScan.colName(meta, c.column).get))
      case m: Min =>
        ZarrAggSpec(ZarrAggSpec.Min,
          names.indexOf(ZarrVarAggScan.colName(meta, m.column).get))
      case m: Max =>
        ZarrAggSpec(ZarrAggSpec.Max,
          names.indexOf(ZarrVarAggScan.colName(meta, m.column).get))
      case s: Sum =>
        ZarrAggSpec(ZarrAggSpec.Sum,
          names.indexOf(ZarrVarAggScan.colName(meta, s.column).get))
      case other =>
        throw new IllegalStateException(s"unexpected pushed aggregate $other")
    }
    ZarrScan.plannedPartitions(meta, consumed, Array.empty, required,
      dim0Range = None).map { p =>
      ZarrVarAggPartition(p.asInstanceOf[ZarrPackedPartition], groupIdx,
        specs): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrVarAggReaderFactory(
      ZarrScan.sharedState(meta, innerRequired, consumed, dim0Range = None))
}

object ZarrVarAggScan {
  /** Resolve a pushed column reference to a dim or data-variable name. */
  private[zarr] def colName(meta: ZarrGroupMeta,
                            e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case fr: org.apache.spark.sql.connector.expressions.NamedReference
        if fr.fieldNames.length == 1 &&
          (meta.za.dims.contains(fr.fieldNames.head) ||
            meta.dataVars.contains(fr.fieldNames.head)) =>
      Some(fr.fieldNames.head)
    case _ => None
  }
}

/** One pushed aggregate: op code + the aggregated column's index in the
  * inner scan's output (−1 for count(*)). */
final case class ZarrAggSpec(op: Int, colIdx: Int)

object ZarrAggSpec {
  val CountStar = 0
  val Count = 1
  val Min = 2
  val Max = 3
  val Sum = 4
}

final case class ZarrVarAggPartition(base: ZarrPackedPartition,
                                     groupIdx: Array[Int],
                                     specs: Seq[ZarrAggSpec])
    extends InputPartition

final case class ZarrVarAggReaderFactory(shared: ZarrScan.SharedScanState)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZarrVarAggReader(shared, partition.asInstanceOf[ZarrVarAggPartition])
}

/** Folds the task's in-bounds cells into per-group partial states in one
  * direct pass over the chunk cursors (primitive reads, no per-cell row
  * allocation), then emits one row per group. State is bounded by the
  * task's distinct group-key count (≤ its cell count — executor memory
  * never depends on archive size).
  */
final class ZarrVarAggReader(shared: ZarrScan.SharedScanState,
                             p: ZarrVarAggPartition)
    extends PartitionReader[InternalRow] {

  private final class GroupState(val keyVals: Array[Double]) {
    val counts = new Array[Long](p.specs.length)
    val doubles = new Array[Double](p.specs.length)
    var seen = false
  }

  /** Map key over the canonical group-key bits, hash cached. The probe
    * instance is reused across cells (bits array shared); only a MISS
    * clones it for storage — one small allocation per cell instead of
    * two arrays plus a boxed Seq. */
  private final class GroupKey(val bits: Array[Long]) {
    override val hashCode: Int = java.util.Arrays.hashCode(bits)
    override def equals(o: Any): Boolean = o match {
      case g: GroupKey => java.util.Arrays.equals(bits, g.bits)
      case _ => false
    }
  }

  private lazy val groups: Iterator[GroupState] = {
    val m = new java.util.LinkedHashMap[GroupKey, GroupState]()
    val specs = p.specs.toArray
    val prefetched = PackedPrefetch(shared, p.base.chunks)
    val probeBits = new Array[Long](p.groupIdx.length)
    p.base.chunks.zipWithIndex.foreach { case (cp, ci) =>
      val cur = new ChunkCursor(shared, cp, prefetched.map(_(ci)))
      while (cur.advance()) {
        var g = 0
        while (g < p.groupIdx.length) {
          var v = cur.colValue(p.groupIdx(g))
          if (v == 0.0) v = 0.0 // normalize -0.0: Spark groups it with 0.0
          probeBits(g) = java.lang.Double.doubleToLongBits(v) // canonical NaN
          g += 1
        }
        var st = m.get(new GroupKey(probeBits))
        if (st == null) {
          val bits = probeBits.clone()
          val keyVals = Array.tabulate(bits.length)(i =>
            java.lang.Double.longBitsToDouble(bits(i)))
          st = new GroupState(keyVals)
          m.put(new GroupKey(bits), st)
        }
        var i = 0
        while (i < specs.length) {
          val s = specs(i)
          s.op match {
            case ZarrAggSpec.CountStar | ZarrAggSpec.Count =>
              st.counts(i) += 1L // cells are never null (fill decodes to NaN)
            case ZarrAggSpec.Min =>
              val v = cur.colValue(s.colIdx)
              if (!st.seen || java.lang.Double.compare(v, st.doubles(i)) < 0)
                st.doubles(i) = v
            case ZarrAggSpec.Max =>
              val v = cur.colValue(s.colIdx)
              if (!st.seen || java.lang.Double.compare(v, st.doubles(i)) > 0)
                st.doubles(i) = v
            case ZarrAggSpec.Sum =>
              st.doubles(i) += cur.colValue(s.colIdx)
          }
          i += 1
        }
        st.seen = true
      }
    }
    import scala.jdk.CollectionConverters._
    m.values().iterator().asScala
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (groups.hasNext) {
      val st = groups.next()
      val out = new Array[Any](p.groupIdx.length + p.specs.length)
      var g = 0
      while (g < p.groupIdx.length) { out(g) = st.keyVals(g); g += 1 }
      var i = 0
      while (i < p.specs.length) {
        val s = p.specs(i)
        out(p.groupIdx.length + i) = s.op match {
          case ZarrAggSpec.CountStar | ZarrAggSpec.Count => st.counts(i)
          case _ => st.doubles(i)
        }
        i += 1
      }
      current = new GenericInternalRow(out)
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
