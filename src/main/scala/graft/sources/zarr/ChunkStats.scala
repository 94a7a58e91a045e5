package graft.sources.zarr

import graft.sources.ByteStore
import graft.sources.ZarrSource.ZarrArray
import org.apache.spark.sql.SparkSession

/** Per-chunk value statistics for a cube group — the zone maps parquet
  * row groups get for free, persisted as a sidecar beside the group: for
  * every data variable and every chunk key, the moments `(cells,
  * nanCount, min, max, sum, sumOfSquares)` over the chunk's in-bounds
  * decoded cells (min/max/sum/sumsq over the non-NaN cells only — every
  * Spark aggregate form over the cell values, plain, NaN-guarded, or
  * squared, derives from these exactly).
  *
  * Two scan-engine consumers:
  *
  *  - **Value-predicate chunk pruning.** A consumed data-variable
  *    predicate (`v > t`) prunes any chunk whose possible-value set —
  *    `[min, max] ∪ {NaN if nanCount > 0}` — misses every interval, the
  *    same read elision dimension predicates get from the coordinates.
  *    Pruning is advisory (a chunk missing from the sidecar is never
  *    pruned) and cannot change results: the cursor re-evaluates the
  *    predicate cell-for-cell on every chunk it does read.
  *  - **Zero-IO aggregate partials.** A chunk whose cells are ALL
  *    selected (dim rectangle covers it, any value mask provably admits
  *    its whole span) and whose pushed group keys are constant across it
  *    answers its partial-aggregate row straight from the sidecar — a
  *    global `compute_statistics` over an analyzed archive reads no
  *    chunk at all ([[ZarrVarAggScan]] stat rows).
  *
  * The sidecar is computed by [[analyze]] — one distributed pass, one
  * task per planned chunk pack, each chunk folded in THE SAME cell order
  * the partial-aggregate reader uses, so a stat-row sum is bit-identical
  * to the fold it replaces. Doubles are stored as raw IEEE-754 bits
  * (JSON has no NaN/±Inf literals; bits round-trip exactly).
  *
  * Two storage forms behind one `_graft_stats.json` discovery document:
  * the default inlines the moments in the document itself (driver-sized,
  * right for groups up to ~10^5 chunks), while `format = "parquet"`
  * writes them straight from the scan tasks to a DISTRIBUTED
  * `_graft_stats.parquet` side table — nothing chunk-count-sized ever
  * lands on the driver, and each query bulk-fetches only ITS candidate
  * chunks' rows (broadcast-joined on chunk key, the archive-index
  * pattern) — the form for 10^7-chunk archives.
  *
  * Staleness contract: the sidecar records the grid's shape + chunk
  * extents and is ignored on any mismatch, which self-invalidates every
  * shape-changing mutation (append, DELETE truncation, rechunk/unchunk).
  * The one same-shape mutation — a writer overwriting chunk objects of
  * an existing identical grid — deletes the discovery document first
  * ([[invalidate]] from the writers), which orphans (and thereby
  * disables) any parquet side table. Reference analog: xarray/dask keep
  * no such statistics and re-read chunks for every reduction; this is
  * the Spark-native ANALYZE TABLE for cube stores.
  */
object ChunkStats {

  val FileName = "_graft_stats.json"
  val ParquetName = "_graft_stats.parquet"
  val GenFileName = "_graft_gen"

  /** One variable's moments over one chunk's in-bounds cells. min/max/
    * sum/sumsq cover the NON-NaN cells ([[java.lang.Double.compare]]
    * ordering, sum in cell order); they are NaN when every cell is NaN. */
  final case class VarStat(cells: Long, nan: Long, min: Double, max: Double,
                           sum: Double, sumsq: Double) {
    def finite: Long = cells - nan
  }

  /** A loaded sidecar: bulk-resolve the moments of (variables × chunk
    * keys); pairs the sidecar has no row for are simply absent (the
    * consumers treat absence as "must read the chunk"). `grids` records
    * the VIRTUAL inner-block grid ANALYZE used per plain-codec variable
    * (sharded variables derive theirs from the codec) — the planner
    * needs it to enumerate block ordinals and the cursor to skip
    * excluded blocks' decode. */
  sealed trait Loaded {
    def bulk(vars: Seq[String], keys: Seq[String])
        : Map[(String, String), VarStat]
    def grids: Map[String, Seq[Int]]
  }

  /** Document-inlined moments, fully resident (the json form). */
  final case class EagerStats(vars: Map[String, Map[String, VarStat]],
                              grids: Map[String, Seq[Int]] = Map.empty)
      extends Loaded {
    override def bulk(vs: Seq[String], keys: Seq[String])
        : Map[(String, String), VarStat] = {
      val b = Map.newBuilder[(String, String), VarStat]
      vs.foreach { v =>
        vars.get(v).foreach { m =>
          keys.foreach { k => m.get(k).foreach(st => b += ((v, k) -> st)) }
        }
      }
      b.result()
    }
  }

  /** Moments in a distributed parquet side table: resolution is one
    * broadcast join of the candidate keys against it — driver memory is
    * O(candidates × vars), never O(archive). */
  final case class ParquetStats(path: String,
                                grids: Map[String, Seq[Int]] = Map.empty)
      extends Loaded {
    override def bulk(vs: Seq[String], keys: Seq[String])
        : Map[(String, String), VarStat] =
      // advisory: a missing/corrupt side table (orphaned by a deleted
      // export, interrupted write) disables the optimization, never the
      // query — absent pairs just mean "read the chunk"
      scala.util.Try(bulkStrict(vs, keys)).getOrElse(Map.empty)

    private def bulkStrict(vs: Seq[String], keys: Seq[String])
        : Map[(String, String), VarStat] = {
      if (vs.isEmpty || keys.isEmpty) return Map.empty
      val spark = SparkSession.active
      import org.apache.spark.sql.functions.{broadcast, col}
      import spark.implicits._
      spark.read.parquet(path)
        .filter(col("var").isin(vs: _*))
        .join(broadcast(keys.distinct.toDF("k")), col("key") === col("k"))
        .select("var", "key", "cells", "nan", "minBits", "maxBits",
          "sumBits", "sumsqBits")
        .collect()
        .map { r =>
          (r.getString(0), r.getString(1)) -> VarStat(
            r.getLong(2), r.getLong(3),
            java.lang.Double.longBitsToDouble(r.getLong(4)),
            java.lang.Double.longBitsToDouble(r.getLong(5)),
            java.lang.Double.longBitsToDouble(r.getLong(6)),
            java.lang.Double.longBitsToDouble(r.getLong(7)))
        }.toMap
    }
  }

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Load the sidecar for a group if one exists AND matches the grid's
    * shape + chunk extents (stale sidecars are ignored, never trusted).
    * The sidecar is ADVISORY: a malformed or truncated document — an
    * interrupted write — silently disables the optimization instead of
    * failing every read of the group. */
  def load(store: ByteStore, dir: String, za: ZarrArray,
           groupDir: String): Option[Loaded] =
    scala.util.Try(loadStrict(store, dir, za, groupDir)).toOption.flatten

  private def loadStrict(store: ByteStore, dir: String, za: ZarrArray,
                         groupDir: String): Option[Loaded] =
    store.readIfExists(s"$dir/$FileName").flatMap { bytes =>
      val doc = mapper.readTree(bytes)
      val okShape = doc.path("graft_stats_format").asInt(-1) == 1 &&
        jsonInts(doc.path("shape")) == za.shape &&
        jsonInts(doc.path("chunks")) == za.chunks
      // write-GENERATION check: every same-shape mutation bumps the
      // group's token ([[invalidate]]); a sidecar stamped with an older
      // token (or none, when a token now exists) is stale. This closes
      // the REDIRECTED-sidecar hole — analyze(outDir)/option("statsDir")
      // documents and archive sidecars beside an index can't be deleted
      // by the group's writers, so they verify the token instead.
      val okGen = Option(doc.get("generation")).map(_.asText) ==
        generationOf(store, groupDir)
      if (!okShape || !okGen) None
      else {
        val grids = {
          val b = Map.newBuilder[String, Seq[Int]]
          val g = doc.path("block_grids")
          g.fieldNames().forEachRemaining(v => b += v -> jsonInts(g.path(v)))
          b.result()
        }
        loadBody(doc, dir, grids)
      }
    }

  private def loadBody(doc: com.fasterxml.jackson.databind.JsonNode,
                       dir: String, grids: Map[String, Seq[Int]])
      : Option[Loaded] = {
      if (doc.path("storage").asText("inline") == "parquet")
        Some(ParquetStats(s"$dir/$ParquetName", grids))
      else {
        val vars = scala.collection.mutable.LinkedHashMap
          .empty[String, Map[String, VarStat]]
        val vn = doc.path("vars")
        vn.fieldNames().forEachRemaining { v =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, VarStat]
          val per = vn.path(v)
          per.fieldNames().forEachRemaining { key =>
            val a = per.path(key)
            m(key) = VarStat(a.get(0).asLong(), a.get(1).asLong(),
              java.lang.Double.longBitsToDouble(a.get(2).asLong()),
              java.lang.Double.longBitsToDouble(a.get(3).asLong()),
              java.lang.Double.longBitsToDouble(a.get(4).asLong()),
              java.lang.Double.longBitsToDouble(a.get(5).asLong()))
          }
          vars(v) = m.toMap
        }
        Some(EagerStats(vars.toMap, grids))
      }
    }

  private def jsonInts(n: com.fasterxml.jackson.databind.JsonNode): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    n.forEach(e => b += e.asInt())
    b.result()
  }

  /** Best-effort sidecar delete — writers that overwrite chunk objects of
    * an existing same-shape grid call this first. Deleting the discovery
    * document disables any parquet side table too. The call ALSO bumps
    * the group's write-generation token: sidecars living elsewhere
    * (analyze's `outDir`, `option("statsDir")`, an archive index dir)
    * cannot be deleted from here, so [[load]] verifies the token they
    * were stamped with instead — a same-shape rewrite can never serve
    * stale zone maps from a redirected document. */
  def invalidate(groupDir: String): Unit = {
    val bs = ByteStore.current
    val p = s"$groupDir/$FileName"
    if (bs.exists(p)) bs.delete(p)
    bs.write(s"$groupDir/$GenFileName",
      java.util.UUID.randomUUID().toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The group's current write-generation token, if any (absent on
    * groups no graft writer has mutated). */
  private def generationOf(store: ByteStore,
                           groupDir: String): Option[String] =
    scala.util.Try(store.readIfExists(s"$groupDir/$GenFileName")
        .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8)))
      .toOption.flatten

  /** ANALYZE: compute the sidecar for an existing group in one
    * distributed pass — one task per planned chunk pack, per-chunk
    * moments folded inside the task in the partial-aggregate reader's
    * cell order. `format = "json"` (default) collects the O(chunks ×
    * vars) moment rows and inlines them in the discovery document;
    * `format = "parquet"` writes them straight from the tasks to the
    * distributed side table (nothing chunk-count-sized on the driver).
    * Writes into `outDir` (default: the group itself; point it elsewhere
    * for read-only stores) and returns the document path. Re-running
    * replaces the sidecar. */
  def analyze(spark: SparkSession, groupDir: String,
              outDir: Option[String] = None,
              vars: Option[Seq[String]] = None,
              format: String = "json",
              maxInlineRows: Long = MaxInlineStatRows): String = {
    val meta = ZarrTable.open(groupDir, vars)
    analyzeMeta(spark, meta, outDir.getOrElse(groupDir), format,
      maxInlineRows = maxInlineRows)
  }

  /** [[analyze]] for an archive directory opened through its persisted
    * index: the sidecar lands beside the index (the archive itself may be
    * read-only), where [[ZarrTable.openArchive]] looks for it. */
  def analyzeArchive(spark: SparkSession, dir: String,
                     concatDim: String = "t",
                     indexDir: Option[String] = None,
                     indexFormat: String = "json",
                     format: String = "json"): String = {
    val meta = ZarrTable.openArchive(dir, concatDim, indexDir, indexFormat)
    analyzeMeta(spark, meta, indexDir.getOrElse(dir), format)
  }

  /** Refresh a shape-stale sidecar after a dim-0 APPEND by re-folding
    * ONLY the chunks at or beyond the old extent — the daily-granule
    * archive shape, where a full re-ANALYZE is O(archive) per append.
    * Applies when the carried doc is inline, same chunk grid, same
    * trailing shape, same generation, and strictly shorter on dim 0;
    * rows of chunks fully inside the old extent carry over verbatim
    * (a possibly half-full boundary chunk re-folds — the cutoff floors
    * to its chunk index). Returns false when not splice-eligible (the
    * caller falls back to the full [[analyzeMeta]]). */
  private[zarr] def analyzeAppendedRefresh(spark: SparkSession,
                                           meta: ZarrGroupMeta,
                                           outDir: String,
                                           format: String): Boolean = {
    if (format != "json") return false
    val bs = ByteStore.current
    val docOpt = bs.readIfExists(s"$outDir/$FileName")
      .flatMap(b => scala.util.Try(mapper.readTree(b)).toOption)
    val doc = docOpt.getOrElse(return false)
    val za = meta.za
    val ok = doc.path("graft_stats_format").asInt(-1) == 1 &&
      doc.path("storage").asText("inline") == "inline" &&
      jsonInts(doc.path("chunks")) == za.chunks && {
        val oldShape = jsonInts(doc.path("shape"))
        oldShape.length == za.shape.length &&
          oldShape.tail == za.shape.tail &&
          oldShape.headOption.exists(h => h > 0 && h < za.shape.head)
      } &&
      Option(doc.get("generation")).map(_.asText) ==
        generationOf(bs, meta.groupDir) &&
      doc.path("vars").isObject && {
        // the carried rows must cover exactly this meta's variables
        // (a vars-filtered analyze over a doc with more would orphan
        // rows; fewer would leave silent gaps)
        val docVars = scala.collection.mutable.Set.empty[String]
        doc.path("vars").fieldNames().forEachRemaining(docVars += _)
        docVars == meta.dataVars.toSet
      }
    if (!ok) return false
    val oldShape0 = jsonInts(doc.path("shape")).head
    val c0 = oldShape0 / za.chunks.head // boundary chunk re-folds
    // carry rows of strictly-before-the-cutoff chunks (block rows ride
    // with their chunk); raw bits pass through untouched
    val carry = Seq.newBuilder[(String, String, Long, Long, Long, Long,
      Long, Long)]
    val vn = doc.path("vars")
    vn.fieldNames().forEachRemaining { v =>
      val per = vn.path(v)
      per.fieldNames().forEachRemaining { key =>
        val chunkKey = key.takeWhile(_ != '#')
        if (chunkKey.takeWhile(_ != '.').toInt < c0) {
          val a = per.path(key)
          carry += ((v, key, a.get(0).asLong(), a.get(1).asLong(),
            a.get(2).asLong(), a.get(3).asLong(), a.get(4).asLong(),
            a.get(5).asLong()))
        }
      }
    }
    analyzeMeta(spark, meta, outDir, format,
      keep = _.head >= c0, carry = carry.result())
    true
  }

  private[zarr] def analyzeMeta(spark: SparkSession, meta: ZarrGroupMeta,
                                outDir: String,
                                format: String = "json",
                                keep: Seq[Int] => Boolean = _ => true,
                                carry: Seq[(String, String, Long, Long,
                                  Long, Long, Long, Long)] = Nil,
                                maxInlineRows: Long = MaxInlineStatRows)
      : String = {
    require(format == "json" || format == "parquet",
      s"stats format must be json or parquet, got $format")
    if (format == "json") {
      val bound = inlineRowBound(meta)
      require(bound <= maxInlineRows,
        s"inline stats doc for ${meta.groupDir} would hold up to $bound " +
          s"rows (budget $maxInlineRows) — a driver-resident document " +
          "this large is not metadata-sized; ANALYZE with " +
          "format = \"parquet\" (the distributed side table plans " +
          "through a broadcast key join and prunes identically)")
    }
    // read the group's write-generation token BEFORE the distributed
    // stats pass runs (the pass executes at the write.parquet / collect
    // below): a writer that invalidates and rewrites the group MID-scan
    // bumps the token, so the sidecar — computed over torn data — is
    // stamped with the pre-rewrite token and the staleness guard
    // correctly rejects it on load
    val genAtStart = generationOf(ByteStore.current, meta.groupDir)
    val required = ZarrTable.schemaFor(meta)
    val shared = ZarrScan.sharedState(meta, required, Array.empty, None)
    val parts = ZarrScan.plannedPartitions(meta, Array.empty, Array.empty,
      required, dim0Range = None)
    val nd = meta.za.dims.length
    val nv = meta.dataVars.length
    val varNames = meta.dataVars.toIndexedSeq
    // SHARDED variables also get per-INNER-chunk block rows (same layout
    // as the write-time fold: key "<chunk>#<ord>"), so an ANALYZE of an
    // existing sharded store enables sub-chunk selective reads exactly
    // like a cube born with stats. LARGE plain-codec chunks — the
    // whole-map NetCDF records of a kerchunk archive — get a VIRTUAL
    // strip grid ([[virtualGrid]]): chunk-granular zone maps cannot
    // prune inside them, but their block rows let the reader skip the
    // element-wise decode of excluded strips (IO stays one ref). (inner
    // shape, block-grid strides, block count) per var; None when no
    // sub-chunk rows apply.
    val gridOf: Map[String, Seq[Int]] = varNames.flatMap { v =>
      meta.varMeta(v).codec match {
        case _: graft.sources.ZarrSource.Shard => None
        case _ => virtualGrid(meta.varMeta(v).chunks).map(v -> _)
      }
    }.toMap
    val shardOf: IndexedSeq[Option[(Array[Int], Array[Int], Int)]] =
      varNames.map { v =>
        val innerOpt = meta.varMeta(v).codec match {
          case sh: graft.sources.ZarrSource.Shard => Some(sh.inner)
          case _ => gridOf.get(v)
        }
        innerOpt.map { inner =>
          val grid = meta.varMeta(v).chunks.zip(inner)
            .map { case (c, i) => c / i }
          (inner.toArray, grid.scanRight(1)(_ * _).tail.toArray, grid.product)
        }
      }
    // one row per (chunk, variable) plus one per populated (chunk,
    // variable, inner block): (var, key, cells, nan, 4 bit-moments)
    val keepF = keep // task-closure value
    val rows = spark.sparkContext
      .parallelize(parts.toSeq, math.max(1, parts.length))
      .flatMap { part =>
        val chunks = part match {
          case pk: ZarrPackedPartition => pk.chunks
          case single: ZarrInputPartition => Seq(single)
          case other => throw new IllegalStateException(s"$other")
        }
        chunks.withFilter(cp => keepF(cp.key)).flatMap { cp =>
          val cur = new ChunkCursor(shared, cp, None)
          val cells = new Array[Long](nv)
          val nan = new Array[Long](nv)
          // [min, max, sum, sumsq] per var, NaN extremes until seen
          val mom = Array.fill(nv)(Array(Double.NaN, Double.NaN, 0.0, 0.0))
          val blocks: Array[Array[Array[Double]]] = shardOf.map {
            case Some((_, _, nB)) =>
              Array.fill(nB)(Array(0.0, 0.0, Double.NaN, Double.NaN,
                0.0, 0.0))
            case None => null
          }.toArray
          def fold6(m: Array[Double], x: Double): Unit = {
            m(0) += 1.0
            if (x.isNaN) m(1) += 1.0
            else {
              if (m(0) - m(1) == 1.0 ||
                java.lang.Double.compare(x, m(2)) < 0) m(2) = x
              if (m(0) - m(1) == 1.0 ||
                java.lang.Double.compare(x, m(3)) > 0) m(3) = x
              m(4) += x
              m(5) += x * x
            }
          }
          while (cur.advance()) {
            var v = 0
            while (v < nv) {
              val x = cur.colValue(nd + v)
              cells(v) += 1L
              if (x.isNaN) nan(v) += 1L
              else {
                val m = mom(v)
                if (cells(v) - nan(v) == 1L ||
                  java.lang.Double.compare(x, m(0)) < 0) m(0) = x
                if (cells(v) - nan(v) == 1L ||
                  java.lang.Double.compare(x, m(1)) > 0) m(1) = x
                m(2) += x
                m(3) += x * x
              }
              if (blocks(v) != null) {
                val (inner, bStride, _) = shardOf(v).get
                val li = cur.localIdx
                var ord = 0
                var k = 0
                while (k < nd) {
                  ord += (li(k) / inner(k)) * bStride(k)
                  k += 1
                }
                fold6(blocks(v)(ord), x)
              }
              v += 1
            }
          }
          val key = cp.key.mkString(".")
          val chunkRows = varNames.indices.map { i =>
            (varNames(i), key, cells(i), nan(i),
              java.lang.Double.doubleToRawLongBits(mom(i)(0)),
              java.lang.Double.doubleToRawLongBits(mom(i)(1)),
              java.lang.Double.doubleToRawLongBits(mom(i)(2)),
              java.lang.Double.doubleToRawLongBits(mom(i)(3)))
          }
          val blockRows = varNames.indices.flatMap { i =>
            if (blocks(i) == null) Nil
            else blocks(i).toSeq.zipWithIndex.collect {
              case (m, ord) if m(0) > 0.0 =>
                (varNames(i), s"$key#$ord", m(0).toLong, m(1).toLong,
                  java.lang.Double.doubleToRawLongBits(m(2)),
                  java.lang.Double.doubleToRawLongBits(m(3)),
                  java.lang.Double.doubleToRawLongBits(m(4)),
                  java.lang.Double.doubleToRawLongBits(m(5)))
            }
          }
          chunkRows ++ blockRows
        }
      }
    val root = mapper.createObjectNode()
    root.put("graft_stats_format", 1)
    val sh = root.putArray("shape"); meta.za.shape.foreach(sh.add)
    val ch = root.putArray("chunks"); meta.za.chunks.foreach(ch.add)
    // stamp the token read before the scan (see genAtStart above) so a
    // redirected sidecar goes stale the moment a writer mutates the group
    genAtStart.foreach(root.put("generation", _))
    if (gridOf.nonEmpty) {
      val bg = root.putObject("block_grids")
      gridOf.foreach { case (v, inner) =>
        val a = bg.putArray(v); inner.foreach(a.add)
      }
    }
    if (format == "parquet") {
      require(carry.isEmpty, "carry rows are json-splice only")
      root.put("storage", "parquet")
      import spark.implicits._
      rows.toDF("var", "key", "cells", "nan", "minBits", "maxBits",
          "sumBits", "sumsqBits")
        .write.mode("overwrite").parquet(s"$outDir/$ParquetName")
    } else {
      val vn = root.putObject("vars")
      val perVar = meta.dataVars.map(v => v -> vn.putObject(v)).toMap
      (carry ++ rows.collect()).foreach {
        case (v, key, cells, nan, mn, mx, s1, s2) =>
          val a = perVar(v).putArray(key)
          a.add(cells); a.add(nan); a.add(mn); a.add(mx); a.add(s1); a.add(s2)
          ()
      }
    }
    val path = s"$outDir/$FileName"
    val bs = ByteStore.current
    bs.mkdirs(outDir)
    bs.write(path, mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path
  }

  /** Write the storage=parquet discovery document — the writer-side
    * companion of [[writeInline]] for cubes whose stat rows exceed the
    * inline budget: the rows land in `_graft_stats.parquet` straight
    * from the write tasks and only this metadata-sized pointer document
    * is driver-written. */
  def writeParquetDoc(outDir: String, shape: Seq[Int], chunks: Seq[Int],
                      blockGrids: Map[String, Seq[Int]] = Map.empty)
      : String = {
    val root = mapper.createObjectNode()
    root.put("graft_stats_format", 1)
    root.put("storage", "parquet")
    val sh = root.putArray("shape"); shape.foreach(sh.add)
    val ch = root.putArray("chunks"); chunks.foreach(ch.add)
    generationOf(ByteStore.current, outDir)
      .foreach(root.put("generation", _))
    if (blockGrids.nonEmpty) {
      val bg = root.putObject("block_grids")
      blockGrids.foreach { case (v, inner) =>
        val a = bg.putArray(v); inner.foreach(a.add)
      }
    }
    val path = s"$outDir/$FileName"
    ByteStore.current.write(path, mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path
  }

  /** Write the inline-form discovery document from already-computed
    * per-chunk moments — the writer-side path: [[graft.sources
    * .ZarrSource.writeCubeVars]] folds each chunk's moments as it
    * assembles the chunk buffer (same in-bounds cell order as the
    * reader), so a freshly-written cube gets its sidecar for free,
    * no ANALYZE pass needed. `entries` carry (chunk key, per-var
    * [cells, nan, min, max, sum, sumsq] — counts exact as doubles). */
  def writeInline(outDir: String, shape: Seq[Int], chunks: Seq[Int],
                  varNames: Seq[String],
                  entries: Seq[(String, Seq[Double])],
                  blockGrids: Map[String, Seq[Int]] = Map.empty): String = {
    val root = mapper.createObjectNode()
    root.put("graft_stats_format", 1)
    val sh = root.putArray("shape"); shape.foreach(sh.add)
    val ch = root.putArray("chunks"); chunks.foreach(ch.add)
    // group-local write: stamp the token the writer's invalidate just
    // bumped, so the fresh sidecar is valid under the generation check
    generationOf(ByteStore.current, outDir)
      .foreach(root.put("generation", _))
    if (blockGrids.nonEmpty) {
      val bg = root.putObject("block_grids")
      blockGrids.foreach { case (v, inner) =>
        val a = bg.putArray(v); inner.foreach(a.add)
      }
    }
    val vn = root.putObject("vars")
    val perVar = varNames.map(v => vn.putObject(v))
    entries.foreach { case (key, flat) =>
      varNames.indices.foreach { i =>
        val a = perVar(i).putArray(key)
        a.add(flat(i * 6).toLong) // cells
        a.add(flat(i * 6 + 1).toLong) // nan
        (2 until 6).foreach(j =>
          a.add(java.lang.Double.doubleToRawLongBits(flat(i * 6 + j))))
      }
    }
    val path = s"$outDir/$FileName"
    val bs = ByteStore.current
    bs.write(path, mapper.writeValueAsString(root)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path
  }

  /** Ceiling on the rows (chunk rows + sub-chunk strip rows) an INLINE
    * json sidecar may hold. The inline doc is driver-resident on every
    * load, so it must stay metadata-sized: 2^20 rows is ~100 MB of json
    * — already generous — while a 10^7-chunk archive × tens of strips
    * per chunk would be a 10^8-row driver document. Past the budget the
    * json form DECLINES LOUDLY and the caller uses the distributed
    * parquet side table (`format = "parquet"`), which plans through a
    * broadcast join of candidate keys and never materializes the
    * archive's stats on the driver. */
  val MaxInlineStatRows: Long = 1L << 20

  /** Upper bound on the inline rows an ANALYZE of `meta` would emit:
    * one per (variable, chunk) plus one per (variable, chunk, inner
    * block) for sharded/strip-gridded variables. A bound, not a count —
    * unpopulated blocks emit nothing — so the budget refusal is
    * conservative and needs no data pass. */
  private[zarr] def inlineRowBound(meta: ZarrGroupMeta): Long =
    meta.dataVars.map { v =>
      val za = meta.varMeta(v)
      val nChunks = za.chunkGrid.map(_.toLong).product
      val nBlocks: Long = za.codec match {
        case sh: graft.sources.ZarrSource.Shard =>
          za.chunks.zip(sh.inner).map { case (c, i) => (c / i).toLong }
            .product
        case _ => virtualGrid(za.chunks)
          .map(g => za.chunks.zip(g).map { case (c, i) => (c / i).toLong }
            .product)
          .getOrElse(0L)
      }
      nChunks * (1L + nBlocks)
    }.sum

  /** Chunks below this many cells keep chunk-granular stats only — a
    * virtual strip grid on small chunks would bloat the sidecar for
    * pruning the zone maps already provide. */
  val MinVirtualChunkCells: Long = 1L << 16

  /** Most strips a virtual grid splits a large chunk into. */
  val MaxVirtualStrips: Int = 64

  /** The virtual inner-block grid ANALYZE uses for a LARGE plain-codec
    * chunk: the slowest non-unit chunk dim splits into the most strips
    * (≤ [[MaxVirtualStrips]]) its extent divides evenly. Splitting only
    * that dim keeps every block a CONTIGUOUS flat range of the decoded
    * buffer — the property [[graft.sources.ZarrSource
    * .decodeChunkSelective]] needs to skip excluded strips' element
    * conversion (and corruption proofs need to target byte ranges).
    * None when the chunk is small or no dim splits. */
  def virtualGrid(chunks: Seq[Int]): Option[Seq[Int]] = {
    if (chunks.map(_.toLong).product < MinVirtualChunkCells) return None
    val k = chunks.indexWhere(_ > 1)
    if (k < 0) return None
    val ext = chunks(k)
    val g = (MaxVirtualStrips to 2 by -1).find(ext % _ == 0)
    g.map(s => chunks.updated(k, ext / s))
  }

  /** A value provably OUTSIDE the packed interval set — the fill for
    * inner chunks a selective shard decode skips: the cursor re-evaluates
    * the predicate per cell, so skipped cells must carry a value that
    * FAILS it. Exists whenever some block was excluded (an all-covering
    * set never excludes anything); when the set does cover every double
    * the fallback return is never consulted. */
  def failValueOutside(packed: Array[Double]): Double = {
    if (packed.length == 0) return 0.0 // never-true filter: all values fail
    // below the first interval
    if (packed(0) > Double.NegativeInfinity) return Double.NegativeInfinity
    // above the last (an interval reaching +Inf also covers NaN)
    if (packed(packed.length - 1) < Double.PositiveInfinity)
      return Double.PositiveInfinity
    // a representable gap between two intervals
    var i = 1
    while (i + 1 < packed.length) {
      val cand = math.nextUp(packed(i))
      if (cand < packed(i + 1)) return cand
      i += 2
    }
    0.0 // set covers every double: nothing is ever excluded
  }

  /** Could SOME cell of a chunk with these stats satisfy the packed
    * interval set? (false ⇒ the chunk is safely prunable). The possible
    * values are `[min, max]` (when any non-NaN cell exists) plus NaN
    * (when nanCount > 0) — NaN sits above +Inf in Spark's ordering, so
    * it matches exactly an interval unbounded above. */
  /** Global guarded (count, min, max) of variable `v` from a
    * document-INLINED sidecar — the driver-resident [[EagerStats]] form
    * only. The distributed parquet side table keeps the pushed-aggregate
    * path: folding an archive-sized stat table on the driver is exactly
    * what [[ParquetStats]] exists to avoid, while the inline doc is
    * already resident, so summing it costs zero Spark jobs. None unless
    * a chunk-level stat row exists for EVERY chunk of the variable's
    * grid — partial coverage would silently misreport the extremes and
    * the count. The count is the NON-NaN cell population, matching the
    * `v <= +Inf` guard of the quantile/statistics folds; min/max are
    * NaN when every cell is NaN (the caller's n == 0 branch). */
  def inlineGlobal(meta: ZarrGroupMeta, v: String)
      : Option[(Long, Double, Double)] = meta.stats match {
    case Some(e: EagerStats) =>
      for {
        za <- meta.varMeta.get(v)
        m <- e.vars.get(v)
        nChunks = za.chunkGrid.map(_.toLong).product
        chunkRows = m.iterator.collect {
          case (k, st) if !k.contains('#') => st
        }.toSeq
        if chunkRows.length.toLong == nChunks
      } yield {
        var n = 0L
        var lo = Double.NaN
        var hi = Double.NaN
        chunkRows.foreach { st =>
          n += st.finite
          if (st.finite > 0) {
            if (lo.isNaN || java.lang.Double.compare(st.min, lo) < 0)
              lo = st.min
            if (hi.isNaN || java.lang.Double.compare(st.max, hi) > 0)
              hi = st.max
          }
        }
        (n, lo, hi)
      }
    case _ => None
  }

  def admits(st: VarStat, packed: Array[Double]): Boolean = {
    if (packed.length == 0) return false
    val nanIn = packed(packed.length - 1) == Double.PositiveInfinity
    if (st.nan > 0 && nanIn) return true
    if (st.finite == 0) return st.nan > 0 && nanIn
    // disjoint ascending intervals: candidate = last interval with
    // lo <= max; it intersects [min, max] iff its hi >= min
    var i = packed.length - 2
    while (i >= 0 && packed(i) > st.max) i -= 2
    i >= 0 && packed(i + 1) >= st.min
  }

  /** Does EVERY cell of a chunk with these stats satisfy the packed
    * interval set? (true ⇒ a fully-covered chunk can answer from the
    * sidecar without reading). Walks the sorted intervals across
    * `[min, max]` tolerating ulp-adjacent pieces (complement splitting
    * produces those), and demands NaN coverage when NaN cells exist. */
  def fullyAdmits(st: VarStat, packed: Array[Double]): Boolean = {
    if (packed.length == 0) return false
    val nanIn = packed(packed.length - 1) == Double.PositiveInfinity
    if (st.nan > 0 && !nanIn) return false
    if (st.finite == 0) return true // NaN-only chunk, NaN covered above
    var i = 0
    while (i < packed.length && !ZarrScan.cellIn(st.min, packed(i), packed(i + 1)))
      i += 2
    if (i >= packed.length) return false
    var hi = packed(i + 1)
    while (ZarrScan.sqlCmp(hi, st.max) < 0) {
      i += 2
      if (i >= packed.length || packed(i) > math.nextUp(hi)) return false
      hi = packed(i + 1)
    }
    true
  }
}
