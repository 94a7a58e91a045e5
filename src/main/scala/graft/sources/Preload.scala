package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util.concurrent.{CompletableFuture, ExecutorService, Executors, TimeUnit}
import scala.collection.concurrent.TrieMap

/** Asynchronous preload of data-store resources into a local cache
  * (reference: `xcube/core/store/preload.py:18-340`,
  * `xcube/core/store/store.py:486-510`).
  *
  * The reference models preload as a driver-side job manager: one task per
  * `data_id`, each reporting `PreloadState(status, progress, message)`
  * updates to a shared handle that can be cancelled, awaited and closed
  * (closing drops the cache). We keep that contract — the HANDLE is
  * driver-side bookkeeping, tiny and thread-safe — but the actual byte
  * movement of each task is a distributed Spark job: `origin.open(id)`
  * produces a DataFrame whose materialization into the cache parquet runs
  * parallel over partitions on the cluster. At 100 TB the preload of one
  * data id is therefore a full-width write, not a single-threaded download;
  * concurrency across data ids only overlaps job scheduling, it does not
  * serialize the data path.
  */
object PreloadStatus {
  sealed abstract class Value(val name: String) {
    override def toString: String = name.toUpperCase
    /** Terminal states can never be overwritten by late task events
      * (reference `preload.py:245-252`). */
    def terminal: Boolean =
      this == Completed || this == Cancelled || this == Failed
  }
  case object Waiting extends Value("waiting")
  case object Started extends Value("started")
  case object Completed extends Value("completed")
  case object Cancelled extends Value("cancelled")
  case object Failed extends Value("failed")
}

/** Mutable per-dataset preload state; `update` merges a PARTIAL event (only
  * non-null fields overwrite, mirroring `PreloadState.update`,
  * `preload.py:52-67`). */
final class PreloadState(
    val dataId: String,
    @volatile var status: PreloadStatus.Value = null,
    @volatile var progress: java.lang.Double = null,
    @volatile var message: String = null,
    @volatile var exception: Throwable = null) {

  def update(event: PreloadState): Unit = if (event.dataId == dataId) {
    if (event.status != null) status = event.status
    if (event.progress != null) progress = event.progress
    if (event.message != null) message = event.message
    if (event.exception != null) exception = event.exception
  }

  private def fields: Seq[(String, Any)] =
    Seq("data_id" -> dataId, "status" -> status, "progress" -> progress,
      "message" -> message, "exception" -> exception)
      .filter(_._2 != null)

  override def toString: String =
    fields.map { case (k, v) => s"$k=$v" }.mkString(", ")
}

/** Handle for a running preload job (`preload.py:77-141`). */
trait PreloadHandle extends AutoCloseable {
  def getState(dataId: String): PreloadState
  def cancelled: Boolean
  def cancel(): Unit
  /** Drop any cache held by the job. Default: nothing. */
  def close(): Unit = ()
  def notify(event: PreloadState): Unit = ()
  /** Plain-text state table (the reference renders tabulate/ipywidgets;
    * we render fixed-width text — `preload.py:343-420`). */
  def toText: String = ""
}

/** Null-pattern handle (`preload.py:144-158`): every state is empty. */
object NullPreloadHandle extends PreloadHandle {
  override def getState(dataId: String): PreloadState = new PreloadState(dataId)
  override def cancelled: Boolean = false
  override def cancel(): Unit = ()
}

/** Executor-backed preload (`preload.py:161-340`): one task per data id on
  * a thread pool, terminal-status protection, optional blocking
  * construction, cancel via a shared flag checked by cooperative tasks.
  *
  * @param preloadData the per-dataset preload body; receives this handle
  *                    (for `notify`/`cancelled` checks) and the data id.
  */
final class ExecutorPreloadHandle(
    dataIds: Seq[String],
    preloadData: (PreloadHandle, String) => Unit,
    parallelism: Int = Runtime.getRuntime.availableProcessors(),
    blocking: Boolean = true,
    onClose: () => Unit = () => ())
  extends PreloadHandle {

  private val states = TrieMap(dataIds.map(id => id -> new PreloadState(
    id, status = PreloadStatus.Waiting, progress = 0.0)): _*)
  private val cancelFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val executor: ExecutorService =
    Executors.newFixedThreadPool(math.max(1, math.min(parallelism, dataIds.size.max(1))))

  // `tasks` are the raw submissions (cancel targets); `settled` are the
  // whenComplete stages that have already recorded the terminal status —
  // awaitDone waits on those so callers observe final states, not races.
  private val tasks: Map[String, CompletableFuture[Void]] = dataIds.map { id =>
    id -> CompletableFuture.runAsync(new Runnable {
      override def run(): Unit = {
        if (cancelFlag.get())
          throw new java.util.concurrent.CancellationException(id)
        ExecutorPreloadHandle.this.notify(
          new PreloadState(id, status = PreloadStatus.Started))
        preloadData(ExecutorPreloadHandle.this, id)
      }
    }, executor)
  }.toMap

  private val settled: Seq[CompletableFuture[Void]] = tasks.toSeq.map {
    case (id, f) => f.whenComplete { (_, err: Throwable) =>
      err match {
        case null =>
          ExecutorPreloadHandle.this.notify(new PreloadState(
            id, status = PreloadStatus.Completed, progress = 1.0))
        case e =>
          val cause = e match {
            case ce: java.util.concurrent.CompletionException
              if ce.getCause != null => ce.getCause
            case other => other
          }
          cause match {
            case _: java.util.concurrent.CancellationException =>
              ExecutorPreloadHandle.this.notify(new PreloadState(
                id, status = PreloadStatus.Cancelled, exception = cause))
            case _ =>
              ExecutorPreloadHandle.this.notify(new PreloadState(
                id, status = PreloadStatus.Failed, exception = cause))
          }
      }
    }
  }

  if (blocking) awaitDone()

  /** Wait for every task to reach a terminal state. */
  def awaitDone(timeoutSec: Int = 600): Unit = {
    try CompletableFuture.allOf(settled: _*)
      .get(timeoutSec.toLong, TimeUnit.SECONDS)
    catch {
      case _: java.util.concurrent.ExecutionException => ()
      case _: java.util.concurrent.CancellationException => ()
    }
    executor.shutdown(); ()
  }

  override def getState(dataId: String): PreloadState =
    states.getOrElse(dataId, new PreloadState(dataId))

  override def cancelled: Boolean = cancelFlag.get()

  override def cancel(): Unit = {
    cancelFlag.set(true)
    tasks.values.foreach(_.cancel(false))
    executor.shutdown(); ()
  }

  override def close(): Unit = { cancel(); onClose() }

  override def notify(event: PreloadState): Unit =
    states.get(event.dataId).foreach { st =>
      st.synchronized {
        // a terminal status is sticky; late progress/messages are dropped
        // with it (preload.py:245-252 returns early on any terminal state)
        if (st.status == null || !st.status.terminal) st.update(event)
      }
    }

  override def toText: String = {
    val rows = dataIds.map { id =>
      val s = getState(id)
      val pct = Option(s.progress).map(p => f"${p * 100}%.0f%%").getOrElse("")
      Seq(id, Option(s.status).map(_.toString).getOrElse(""), pct,
        Option(s.message).getOrElse(""))
    }
    val header = Seq("Data ID", "Status", "Progress", "Message")
    val all = header +: rows
    val widths = all.transpose.map(_.map(_.length).max)
    all.map(r => r.zip(widths).map { case (c, w) => c.padTo(w, ' ') }
      .mkString("  ").stripTrailing()).mkString("\n")
  }
}

/** A [[DataStore]] decorator with a preload cache: `preloadData` launches
  * the async materialization of origin datasets into `cacheDir` as parquet;
  * `open` serves the cached copy when present (else falls through to the
  * origin). `close` on the returned handle drops the cache — the
  * `PreloadHandle.close` contract (`preload.py:101-110`).
  *
  * At scale: the cache write is a distributed parquet job per data id, so
  * preloading a slow/remote format (NetCDF over HTTP, JP2, ...) once turns
  * all later reads into pruned columnar scans — the same motivation as the
  * reference's download-and-unpack preload, re-expressed as a format
  * conversion instead of a byte copy.
  */
final class CachedDataStore(spark: SparkSession, origin: DataStore,
    cacheDir: String) extends DataStore {

  private val preloaded = TrieMap.empty[String, String]

  private def cachePath(dataId: String): String =
    new java.io.File(cacheDir,
      dataId.replaceAll("[^A-Za-z0-9._-]", "_") + ".cache.parquet").toString

  override def listDataIds(): Seq[String] = origin.listDataIds()
  override def describe(dataId: String): String = origin.describe(dataId)

  override def open(dataId: String): DataFrame =
    preloaded.get(dataId) match {
      case Some(path) => spark.read.parquet(path)
      case None => origin.open(dataId)
    }

  override def write(dataId: String, df: DataFrame, mode: String): Unit =
    origin.write(dataId, df, mode)

  /** True if `open(dataId)` would be served from the cache. */
  def isPreloaded(dataId: String): Boolean = preloaded.contains(dataId)

  def preloadData(dataIds: Seq[String], blocking: Boolean = true,
      parallelism: Int = 4): ExecutorPreloadHandle =
    new ExecutorPreloadHandle(
      dataIds,
      preloadData = (handle, id) => {
        handle.notify(new PreloadState(id, progress = 0.1,
          message = "opening origin"))
        val df = origin.open(id)
        if (handle.cancelled)
          throw new java.util.concurrent.CancellationException(id)
        handle.notify(new PreloadState(id, progress = 0.5,
          message = "materializing cache"))
        val path = cachePath(id)
        df.write.mode("overwrite").parquet(path)
        preloaded.put(id, path)
        handle.notify(new PreloadState(id, progress = 0.9,
          message = "cache written"))
      },
      parallelism = parallelism,
      blocking = blocking,
      onClose = () => {
        preloaded.clear()
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(new java.io.File(cacheDir))
      })
}
