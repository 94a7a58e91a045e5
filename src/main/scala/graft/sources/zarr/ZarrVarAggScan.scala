package graft.sources.zarr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.{GeneralScalarExpression, NamedReference, Cast => VCast, Expression => VExpr}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

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
  * Group keys may be plain dimension columns OR block indices — the
  * subsample / pyramid-build / resample shape (reference
  * subsampling.py:25-135, level.py:107, temporal.py:82-84):
  * `floor((dim ± c) / s)`, `floor((c - dim) / s)` (image-down y axes),
  * and the composed `(floor((dim - c) / s) / k).cast(long)` that a
  * pyramid level built over a base grid emits. A block key is computed
  * per cell from the chunk's own O(chunk) coordinate slice with Spark's
  * exact Floor/Cast-over-double semantics, so `GROUP BY floor(x/k),
  * floor(y/k)` — building a pyramid level FROM the archive — folds per
  * chunk exactly like a plain dim group instead of streaming every cell
  * through the exchange.
  *
  * Aggregated columns may be plain (dims or data variables) or the
  * NaN-skipping guard `CASE WHEN v <= +Inf THEN v END` — Spark's double
  * ordering makes `v <= +Inf` false exactly for NaN, which is how
  * [[graft.operators.TemporalOps.methodAgg]] expresses xarray's skipna
  * in translatable form. The fold then counts/sums/compares only non-NaN
  * cells and emits null for a group with none — precisely Spark's own
  * null-skipping aggregate semantics over the guarded column.
  *
  * Semantics match Spark's partial aggregation exactly: cells are never
  * null (missing chunks decode to the fill value), unguarded
  * Count/CountStar therefore count cells, Sum is plain double addition
  * in cell order (the same order the row scan would feed Spark's partial
  * agg), and Min/Max use `java.lang.Double.compare` ordering — NaN
  * greatest, -0.0 < 0.0 — which is Spark's DoubleType ordering. Double
  * group keys normalize -0.0 to 0.0 and canonicalize NaN bits, mirroring
  * Spark's grouping-key normalization; block keys are longs computed
  * bit-for-bit as the Floor(Divide(...))/Cast chain Spark would run, NaN
  * and ±Inf included.
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
                                schema: StructType,
                                groupKeys: Seq[ZarrGroupKey])
    extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"ZarrVarAggScan ${meta.groupDir} GroupBy: [" +
      groupKeys.map(_.render).mkString(", ") + "] " +
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
      case c: Count => ZarrVarAggScan.aggColumn(meta, c.column).map(_._1)
      case m: Min => ZarrVarAggScan.aggColumn(meta, m.column).map(_._1)
      case m: Max => ZarrVarAggScan.aggColumn(meta, m.column).map(_._1)
      case s: Sum => ZarrVarAggScan.aggColumn(meta, s.column).map(_._1)
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
    val bound = groupKeys.map(k => k.copy(colIdx = names.indexOf(k.dim))).toArray
    def spec(op: Int, column: VExpr): ZarrAggSpec = {
      val (name, skipNaN) = ZarrVarAggScan.aggColumn(meta, column).get
      ZarrAggSpec(op, names.indexOf(name), skipNaN)
    }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => ZarrAggSpec(ZarrAggSpec.CountStar, -1)
      case c: Count => spec(ZarrAggSpec.Count, c.column)
      case m: Min => spec(ZarrAggSpec.Min, m.column)
      case m: Max => spec(ZarrAggSpec.Max, m.column)
      case s: Sum => spec(ZarrAggSpec.Sum, s.column)
      case other =>
        throw new IllegalStateException(s"unexpected pushed aggregate $other")
    }
    ZarrScan.plannedPartitions(meta, consumed, Array.empty, required,
      dim0Range = None).map { p =>
      ZarrVarAggPartition(p.asInstanceOf[ZarrPackedPartition], bound,
        specs): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrVarAggReaderFactory(
      ZarrScan.sharedState(meta, innerRequired, consumed, dim0Range = None))
}

object ZarrVarAggScan {
  /** Resolve a pushed aggregate COLUMN: a plain dim / data-variable
    * reference, or the NaN-skipping guard `CASE WHEN col <= +Inf THEN
    * col END` (false only for NaN under Spark's double ordering — the
    * translatable skipna form). Returns (column name, skipNaN). */
  private[zarr] def aggColumn(meta: ZarrGroupMeta,
                              e: VExpr): Option[(String, Boolean)] = e match {
    case fr: NamedReference if colOf(meta, fr).isDefined =>
      colOf(meta, fr).map(_ -> false)
    case g: GeneralScalarExpression
        if g.name == "CASE_WHEN" && g.children().length == 2 =>
      (g.children()(0), g.children()(1)) match {
        case (cond: GeneralScalarExpression, value: NamedReference)
            if cond.name == "<=" && cond.children().length == 2 =>
          for {
            name <- colOf(meta, value)
            guarded <- cond.children()(0) match {
              case fr: NamedReference => colOf(meta, fr)
              case _ => None
            }
            if guarded == name
            lim <- litNum(cond.children()(1))
            if lim == Double.PositiveInfinity
          } yield name -> true
        case _ => None
      }
    case _ => None
  }

  private def colOf(meta: ZarrGroupMeta, fr: NamedReference): Option[String] =
    if (fr.fieldNames.length == 1 &&
      (meta.za.dims.contains(fr.fieldNames.head) ||
        meta.dataVars.contains(fr.fieldNames.head)))
      Some(fr.fieldNames.head)
    else None

  private def litNum(e: VExpr): Option[Double] = e match {
    case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
      l.value match {
        case d: java.lang.Double => Some(d.doubleValue)
        case f: java.lang.Float => Some(f.toDouble)
        case n: java.lang.Number => Some(n.doubleValue())
        case _ => None
      }
    case _ => None
  }

  private def dimRef(meta: ZarrGroupMeta, e: VExpr): Option[String] = e match {
    case fr: NamedReference
        if fr.fieldNames.length == 1 &&
          meta.za.dims.contains(fr.fieldNames.head) =>
      Some(fr.fieldNames.head)
    case _ => None
  }

  /** One pushed group-by expression as a foldable key: a plain dim
    * reference, a block index `FLOOR((dim ± c) / s)` / `FLOOR((c - dim)
    * / s)` / `FLOOR(dim / s)` (Catalyst's `floor(col / lit)` shapes after
    * constant folding), or the composed `CAST(CAST(FLOOR(...) AS DOUBLE)
    * / k AS LONG)` a pyramid level built over a base grid emits
    * (GridMapping.iExpr / k). Offsets are stored pre-arranged so the
    * reader's reconstruction is bit-identical to Spark's own evaluation
    * (IEEE: a - b == a + (-b) and c - v == off - v exactly). Anything
    * else returns None and the aggregate stays Spark-side. */
  private[zarr] def groupKey(meta: ZarrGroupMeta,
                             e: VExpr): Option[ZarrGroupKey] = e match {
    case fr: NamedReference =>
      dimRef(meta, fr).map(dm =>
        ZarrGroupKey(dm, ZarrGroupKey.Id, neg = false, 0.0, 1.0, 1.0))
    case g: GeneralScalarExpression if g.name == "FLOOR" =>
      floorKey(meta, g)
    case c: VCast if c.dataType == LongType =>
      c.expression() match {
        // a re-cast floor is still just the floor
        case f: GeneralScalarExpression if f.name == "FLOOR" =>
          floorKey(meta, f)
        // trunc-composed: (floor(...) cast double / k) cast long
        case d: GeneralScalarExpression
            if d.name == "/" && d.children().length == 2 =>
          for {
            k <- litNum(d.children()(1))
            if java.lang.Double.isFinite(k) && k != 0.0
            inner <- d.children()(0) match {
              case ic: VCast if ic.dataType == DoubleType =>
                ic.expression() match {
                  case f: GeneralScalarExpression if f.name == "FLOOR" =>
                    floorKey(meta, f)
                  case _ => None
                }
              case _ => None
            }
          } yield inner.copy(kind = ZarrGroupKey.FloorDiv, div = k)
        case _ => None
      }
    case _ => None
  }

  private def floorKey(meta: ZarrGroupMeta,
                       g: GeneralScalarExpression): Option[ZarrGroupKey] = {
    if (g.children().length != 1) return None
    g.children()(0) match {
      case d: GeneralScalarExpression
          if d.name == "/" && d.children().length == 2 =>
        for {
          s <- litNum(d.children()(1))
          if java.lang.Double.isFinite(s) && s != 0.0
          key <- d.children()(0) match {
            case fr: NamedReference =>
              dimRef(meta, fr).map(dm =>
                ZarrGroupKey(dm, ZarrGroupKey.Floor, neg = false, 0.0, s, 1.0))
            case pm: GeneralScalarExpression
                if (pm.name == "+" || pm.name == "-") &&
                  pm.children().length == 2 =>
              (dimRef(meta, pm.children()(0)), litNum(pm.children()(1)),
                dimRef(meta, pm.children()(1)), litNum(pm.children()(0))) match {
                case (Some(dm), Some(c), _, _) => // dim + c / dim - c
                  Some(ZarrGroupKey(dm, ZarrGroupKey.Floor, neg = false,
                    if (pm.name == "-") -c else c, s, 1.0))
                case (_, _, Some(dm), Some(c)) if pm.name == "+" => // c + dim
                  Some(ZarrGroupKey(dm, ZarrGroupKey.Floor, neg = false,
                    c, s, 1.0))
                case (_, _, Some(dm), Some(c)) => // c - dim (image-down y)
                  Some(ZarrGroupKey(dm, ZarrGroupKey.Floor, neg = true,
                    c, s, 1.0))
                case _ => None
              }
            case _ => None
          }
        } yield key
      case _ => None
    }
  }
}

/** One group-by key of the pushed partial aggregate.
  *
  *  - `Id`: a plain dim column — key is the coordinate value (double).
  *  - `Floor`: `floor((dim + off) / scale)` or `floor((off - dim) /
  *    scale)` when `neg` — key is a long with Spark's Floor semantics.
  *  - `FloorDiv`: the Floor key re-divided and truncated,
  *    `(floorKey.toDouble / div).toLong` — Spark's Cast(double→long)
  *    on `(floor(...) / k)`, the pyramid-over-grid composition.
  *
  * `colIdx` binds to the inner scan's column order at planning time. */
final case class ZarrGroupKey(dim: String, kind: Int, neg: Boolean,
                              off: Double, scale: Double, div: Double,
                              colIdx: Int = -1) {
  /** Spark-exact long key for Floor/FloorDiv kinds. */
  def evalLong(v: Double): Long = {
    val base = if (neg) off - v else v + off
    val f = math.floor(base / scale).toLong
    if (kind == ZarrGroupKey.FloorDiv) (f.toDouble / div).toLong else f
  }

  def render: String =
    if (kind == ZarrGroupKey.Id) dim
    else {
      val base =
        if (neg) s"($off - $dim)"
        else if (off == 0.0) dim
        else if (off < 0.0) s"($dim - ${-off})"
        else s"($dim + $off)"
      val fl = s"floor($base / $scale)"
      if (kind == ZarrGroupKey.FloorDiv) s"trunc($fl / $div)" else fl
    }
}

object ZarrGroupKey {
  val Id = 0
  val Floor = 1
  val FloorDiv = 2
}

/** One pushed aggregate: op code + the aggregated column's index in the
  * inner scan's output (−1 for count(*)) + whether the column carried
  * the NaN-skip guard. */
final case class ZarrAggSpec(op: Int, colIdx: Int, skipNaN: Boolean = false)

object ZarrAggSpec {
  val CountStar = 0
  val Count = 1
  val Min = 2
  val Max = 3
  val Sum = 4
}

final case class ZarrVarAggPartition(base: ZarrPackedPartition,
                                     groupKeys: Array[ZarrGroupKey],
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
  * never depends on archive size; block keys only shrink it).
  */
final class ZarrVarAggReader(shared: ZarrScan.SharedScanState,
                             p: ZarrVarAggPartition)
    extends PartitionReader[InternalRow] {

  private final class GroupState(val keyBits: Array[Long]) {
    val counts = new Array[Long](p.specs.length)
    val doubles = new Array[Double](p.specs.length)
    // per-spec "contributed at least once": min/max/sum of an all-skipped
    // (all-NaN guarded) column must emit null, exactly like Spark's
    // null-skipping aggregate over the guarded scan
    val has = new Array[Boolean](p.specs.length)
  }

  /** Map key over the group-key bits (canonical double bits for dim keys,
    * the long block index itself for floor keys), hash cached. The probe
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
    val keys = p.groupKeys
    val prefetched = PackedPrefetch(shared, p.base.chunks)
    val probeBits = new Array[Long](keys.length)
    p.base.chunks.zipWithIndex.foreach { case (cp, ci) =>
      val cur = new ChunkCursor(shared, cp, prefetched.map(_(ci)))
      while (cur.advance()) {
        var g = 0
        while (g < keys.length) {
          val k = keys(g)
          val v = cur.colValue(k.colIdx)
          probeBits(g) =
            if (k.kind != ZarrGroupKey.Id) k.evalLong(v)
            else {
              var d = v
              if (d == 0.0) d = 0.0 // normalize -0.0: Spark groups it with 0.0
              java.lang.Double.doubleToLongBits(d) // canonical NaN
            }
          g += 1
        }
        var st = m.get(new GroupKey(probeBits))
        if (st == null) {
          val bits = probeBits.clone()
          st = new GroupState(bits)
          m.put(new GroupKey(bits), st)
        }
        var i = 0
        while (i < specs.length) {
          val s = specs(i)
          s.op match {
            case ZarrAggSpec.CountStar =>
              st.counts(i) += 1L // cells are never null
            case ZarrAggSpec.Count =>
              if (!s.skipNaN || !cur.colValue(s.colIdx).isNaN)
                st.counts(i) += 1L
            case ZarrAggSpec.Min =>
              val v = cur.colValue(s.colIdx)
              if (!s.skipNaN || !v.isNaN) {
                if (!st.has(i) || java.lang.Double.compare(v, st.doubles(i)) < 0)
                  st.doubles(i) = v
                st.has(i) = true
              }
            case ZarrAggSpec.Max =>
              val v = cur.colValue(s.colIdx)
              if (!s.skipNaN || !v.isNaN) {
                if (!st.has(i) || java.lang.Double.compare(v, st.doubles(i)) > 0)
                  st.doubles(i) = v
                st.has(i) = true
              }
            case ZarrAggSpec.Sum =>
              val v = cur.colValue(s.colIdx)
              if (!s.skipNaN || !v.isNaN) {
                st.doubles(i) += v
                st.has(i) = true
              }
          }
          i += 1
        }
      }
    }
    import scala.jdk.CollectionConverters._
    m.values().iterator().asScala
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (groups.hasNext) {
      val st = groups.next()
      val keys = p.groupKeys
      val out = new Array[Any](keys.length + p.specs.length)
      var g = 0
      while (g < keys.length) {
        out(g) =
          if (keys(g).kind != ZarrGroupKey.Id) st.keyBits(g) // long block idx
          else java.lang.Double.longBitsToDouble(st.keyBits(g))
        g += 1
      }
      var i = 0
      while (i < p.specs.length) {
        val s = p.specs(i)
        out(keys.length + i) = s.op match {
          case ZarrAggSpec.CountStar | ZarrAggSpec.Count => st.counts(i)
          case _ => if (st.has(i)) st.doubles(i) else null
        }
        i += 1
      }
      current = new GenericInternalRow(out)
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
