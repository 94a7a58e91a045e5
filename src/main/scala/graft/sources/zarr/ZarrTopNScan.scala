package graft.sources.zarr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Partial TOP-N fold over data variables — `ORDER BY v DESC LIMIT k`
  * where the first sort key is NOT a prunable dimension. The slab-planned
  * top-n ([[ZarrScan]]) can elide whole chunks because a monotone
  * coordinate orders the archive physically; a DATA-variable ordering has
  * no such structure, so every surviving chunk must be read — but nothing
  * obliges the scan to stream every cell into Spark's TakeOrdered just to
  * discard all but k. This scan keeps a bounded heap of the task's best k
  * rows under the FULL lexicographic sort tuple (Spark's double ordering
  * per key: NaN greatest, zeros equal; values are never null) inside the
  * partition reader and emits only those; Spark re-applies the complete
  * sort + limit above the partial scan (`isPartiallyPushed`), so the
  * result is exact. At 100 TB the exchange above the scan carries
  * O(tasks × k) rows instead of O(cells) — a "hottest cells" query over a
  * 10^7-chunk archive ships ~k rows per task, not 10^13 cells.
  *
  * Because the heap orders by the WHOLE sort tuple, a dropped row can
  * only tie a kept row on every key — the standard SQL tie
  * nondeterminism, never a wrong row (this is also why the scan accepts
  * secondary keys without the strict-monotonicity demand the slab cut
  * needs). Pushed dimension predicates still prune chunks first and the
  * cursor still applies them cell-for-cell. The reference analog is
  * dask's blockwise `topk` tree-reduction; here it is optimizer-driven,
  * shared by every connector on this scan engine.
  */
final case class ZarrTopNScan(meta: ZarrGroupMeta, consumed: Array[Filter],
                              required: StructType,
                              sortSpecs: Seq[(String, Boolean)], n: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val keys = sortSpecs.map { case (c, desc) =>
      s"$c ${if (desc) "DESC" else "ASC"}"
    }.mkString(", ")
    val f = consumed.map(_.toString).mkString(", ")
    s"ZarrTopNScan ${meta.groupDir} PushedTopNFold: [$keys LIMIT $n], " +
      s"PushedFilters: [$f], ReadSchema: ${required.fieldNames.mkString(",")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val names = required.fieldNames.toSeq
    val bound = sortSpecs.map { case (c, desc) => (names.indexOf(c), desc) }
    val shared = ZarrScan.sharedState(meta, required, consumed, None)
    val chunkParts =
      ZarrScan.planChunkParts(meta, consumed, Array.empty, required, None)
    ZarrScan.pack(pruneByStats(chunkParts, shared), meta.za,
      required.fields.length).map { p =>
      ZarrTopNPartition(p.asInstanceOf[ZarrPackedPartition],
        bound.toArray, n): InputPartition
    }
  }

  /** Zone-map top-n pruning through the ANALYZE sidecar: `ORDER BY v
    * DESC LIMIT k` can provably skip every chunk whose best possible
    * sort-key value is strictly worse than the k-th GUARANTEED value.
    * Guarantees come only from chunks whose cells are all actually
    * emitted (fully dim-selected, fully admitted by any value mask):
    * such a chunk with `nan` NaN cells and `finite` non-NaN cells
    * guarantees `nan` cells at NaN (greatest under Spark ordering) and
    * `finite` cells at-or-above its min (DESC; mirrored for ASC).
    * Accumulating guarantees best-first until k cells yields a
    * threshold T with k emitted cells at-or-better than T, so any chunk
    * whose best value is strictly worse than T cannot contribute to ANY
    * valid top-k — dropped rows are strictly worse on the FIRST key, so
    * secondary keys never resurrect them. Exclusion needs no coverage
    * check (emitted cells are a subset of the chunk's cells, so the
    * sidecar's extreme bounds them); unknown chunks are never pruned.
    * The "hottest cells" query over an analyzed archive reads a handful
    * of chunks instead of all of them. */
  private def pruneByStats(chunkParts: Seq[ZarrInputPartition],
                           shared: ZarrScan.SharedScanState)
      : Seq[ZarrInputPartition] = {
    val (vcol, desc) = sortSpecs.head
    if (n <= 0 || !meta.dataVars.contains(vcol)) return chunkParts
    val st = meta.stats.getOrElse(return chunkParts)
    val keyStrs = chunkParts.map(_.key.mkString("."))
    val maskVars = shared.varIvs.map(_._1).filterNot(_ == vcol)
    val statMap = st.bulk(vcol +: maskVars, keyStrs)
    def cellsOf(cp: ZarrInputPartition): Long =
      meta.za.dims.indices.map { k =>
        val s = cp.key(k) * meta.za.chunks(k)
        (math.min(s + meta.za.chunks(k), meta.za.shape(k)) - s).toLong
      }.product
    // (bound value, cell count) guarantees, from fully-emitted chunks
    val guarantees = chunkParts.zip(keyStrs).flatMap { case (cp, ks) =>
      statMap.get((vcol, ks)) match {
        case Some(vs) if vs.cells == cellsOf(cp) &&
            ZarrScan.chunkFullySelected(meta, shared, cp) &&
            shared.varIvs.forall { case (nm, packed) =>
              statMap.get((nm, ks)).exists(s2 =>
                s2.cells == vs.cells && ChunkStats.fullyAdmits(s2, packed))
            } =>
          val b = Seq.newBuilder[(Double, Long)]
          if (desc) {
            if (vs.nan > 0) b += ((Double.NaN, vs.nan)) // NaN ranks greatest
            if (vs.finite > 0) b += ((vs.min, vs.finite))
          } else {
            if (vs.finite > 0) b += ((vs.max, vs.finite))
            if (vs.nan > 0) b += ((Double.NaN, vs.nan)) // weakest ASC bound
          }
          b.result()
        case _ => Nil
      }
    }
    val ord = new Ordering[Double] {
      def compare(a: Double, b: Double): Int = ZarrScan.sqlCmp(a, b)
    }
    val bestFirst =
      guarantees.sortBy(_._1)(if (desc) ord.reverse else ord)
    var acc = 0L
    var threshold: Option[Double] = None
    bestFirst.foreach { case (v, c) =>
      if (acc < n) {
        acc += c
        if (acc >= n) threshold = Some(v)
      }
    }
    threshold match {
      case None => chunkParts // fewer than n guaranteed cells
      case Some(t) =>
        chunkParts.zip(keyStrs).collect {
          case (cp, ks) if statMap.get((vcol, ks)).forall { vs =>
            val best =
              if (desc) { if (vs.nan > 0) Double.NaN else vs.max }
              else { if (vs.finite > 0) vs.min else Double.NaN }
            val cmp = ZarrScan.sqlCmp(best, t)
            if (desc) cmp >= 0 else cmp <= 0
          } => cp
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrTopNReaderFactory(
      ZarrScan.sharedState(meta, required, consumed, dim0Range = None))
}

final case class ZarrTopNPartition(base: ZarrPackedPartition,
                                   sortIdx: Array[(Int, Boolean)], n: Int)
    extends InputPartition

final case class ZarrTopNReaderFactory(shared: ZarrScan.SharedScanState)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZarrTopNReader(shared, partition.asInstanceOf[ZarrTopNPartition])
}

/** One pass over the task's cursors into a bounded binary heap (root =
  * the WORST kept row, so an incoming better row replaces the root in
  * O(log k)); memory is O(k × columns) regardless of chunk count. */
final class ZarrTopNReader(shared: ZarrScan.SharedScanState,
                           p: ZarrTopNPartition)
    extends PartitionReader[InternalRow] {

  /** a sorts after b (>0), before (<0), ties (0) — the pushed ordering. */
  private def cmp(a: Array[Double], b: Array[Double]): Int = {
    var i = 0
    while (i < p.sortIdx.length) {
      val (c, desc) = p.sortIdx(i)
      val r = ZarrScan.sqlCmp(a(c), b(c))
      if (r != 0) return if (desc) -r else r
      i += 1
    }
    0
  }

  private lazy val kept: Array[Array[Double]] = {
    val heap = new Array[Array[Double]](math.max(p.n, 0))
    var size = 0
    def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val par = (i - 1) >> 1
        if (cmp(heap(i), heap(par)) > 0) {
          val t = heap(i); heap(i) = heap(par); heap(par) = t; i = par
        } else i = 0
      }
    }
    def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i // the worst of parent and children bubbles up
        if (l < size && cmp(heap(l), heap(w)) > 0) w = l
        if (r < size && cmp(heap(r), heap(w)) > 0) w = r
        if (w == i) done = true
        else { val t = heap(i); heap(i) = heap(w); heap(w) = t; i = w }
      }
    }
    if (p.n > 0) {
      val prefetched = PackedPrefetch(shared, p.base.chunks)
      p.base.chunks.zipWithIndex.foreach { case (cp, ci) =>
        val cur = new ChunkCursor(shared, cp, prefetched.map(_(ci)))
        while (cur.advance()) {
          if (size < p.n) {
            val row = new Array[Double](cur.nCols)
            var c = 0
            while (c < cur.nCols) { row(c) = cur.colValue(c); c += 1 }
            heap(size) = row
            size += 1
            siftUp(size - 1)
          } else {
            // cheap reject against the current worst before materializing
            var i = 0
            var r = 0
            while (r == 0 && i < p.sortIdx.length) {
              val (c, desc) = p.sortIdx(i)
              val s = ZarrScan.sqlCmp(cur.colValue(c), heap(0)(c))
              r = if (desc) -s else s
              i += 1
            }
            if (r < 0) {
              val row = new Array[Double](cur.nCols)
              var c = 0
              while (c < cur.nCols) { row(c) = cur.colValue(c); c += 1 }
              heap(0) = row
              siftDown()
            }
          }
        }
      }
    }
    java.util.Arrays.copyOf(heap, size)
  }

  private var at = -1

  override def next(): Boolean = {
    at += 1
    at < kept.length
  }

  override def get(): InternalRow = {
    val row = kept(at)
    val out = new Array[Any](row.length)
    var c = 0
    while (c < row.length) { out(c) = row(c); c += 1 }
    new GenericInternalRow(out)
  }

  override def close(): Unit = ()
}
