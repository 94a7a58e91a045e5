package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import graft.sources.DataStore
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Paths}
import java.util.concurrent.{Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Server auto-reload of datasets (reference `xcube/server/helpers.py:12-42`
  * `ConfigChangeObserver` + `xcube/webapi/datasets/context.py` dataset
  * configs; `cli/serve.py:257` wires the observer at `--update-after`
  * seconds).
  *
  * The reference polls the config files' mtimes on the server's event loop
  * and, on change, re-parses the config and swaps the dataset context;
  * dataset entries whose config is unchanged keep their open handles. The
  * Spark-native analog: the registry maps dataset identifiers to LAZY
  * DataFrames (a `DataFrame` is a plan, not data — "open" costs schema
  * inference only, and every query against it still plans/prunes/distributes
  * normally), so a reload swap is a metadata operation no matter how large
  * the underlying cubes are. Unchanged (identifier, path) entries keep
  * their DataFrame object so downstream plan caches / ReusedExchange keyed
  * on the plan identity survive a config reload.
  */
final case class DatasetConfigEntry(identifier: String, path: String,
    title: String = "")

/** Parsed server configuration: the `Datasets` list of an xcube-serve-style
  * JSON config (`{"Datasets":[{"Identifier":..,"Path":..,"Title":..}]}`).
  * Relative paths resolve against the config file's directory. */
object ServerConfig {
  private val mapper = new ObjectMapper()

  def parse(configPath: String): Seq[DatasetConfigEntry] = {
    val root = mapper.readTree(Files.readAllBytes(Paths.get(configPath)))
    val base = Option(Paths.get(configPath).getParent)
      .getOrElse(Paths.get("."))
    val ds = root.path("Datasets")
    require(ds.isArray, s"config $configPath: 'Datasets' must be an array")
    ds.elements().asScala.map { n =>
      val id = n.path("Identifier").asText("")
      val p = n.path("Path").asText("")
      require(id.nonEmpty && p.nonEmpty,
        s"config $configPath: dataset needs Identifier and Path")
      val abs = if (Paths.get(p).isAbsolute) p else base.resolve(p).toString
      DatasetConfigEntry(id, abs, n.path("Title").asText(""))
    }.toSeq
  }
}

/** The serving-side dataset registry: identifier → open (lazy) DataFrame.
  * `update` applies a full new config: new/changed entries are (re)opened
  * with format inference, removed entries are dropped, unchanged entries
  * are REUSED (same DataFrame instance). Mirrors the context re-creation
  * semantics of `server.update(next_config)`. */
final class ServerContext(spark: SparkSession) {

  private val entries = TrieMap.empty[String, (DatasetConfigEntry, DataFrame)]
  @volatile private var lastError: Option[Throwable] = None
  private val updateCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  def datasetIds: Seq[String] = entries.keys.toSeq.sorted
  def dataset(id: String): DataFrame = entries(id)._2
  def config(id: String): DatasetConfigEntry = entries(id)._1
  /** Number of successful `update` applications (the reload test hook). */
  def updateCount: Int = updateCounter.get()
  /** The error of the last FAILED update, if the most recent one failed. */
  def lastUpdateError: Option[Throwable] = lastError

  /** Apply a new full configuration. On any open failure the registry is
    * left exactly as before (all-or-nothing), and the error is recorded —
    * a bad config edit must not take down currently-served datasets. */
  def update(configs: Seq[DatasetConfigEntry]): Unit = synchronized {
    try {
      val next = configs.map { c =>
        entries.get(c.identifier) match {
          case Some((old, df)) if old == c => c.identifier -> (c, df)
          case _ => c.identifier -> (c, DataStore.openDataset(spark, c.path))
        }
      }.toMap
      entries.keys.filterNot(next.contains).toSeq.foreach(entries.remove)
      next.foreach { case (k, v) => entries.put(k, v) }
      lastError = None
      updateCounter.incrementAndGet(); ()
    } catch {
      case e: Exception => lastError = Some(e)
    }
  }
}

/** mtime-polling observer (`server/helpers.py:12-42`): `check()` stats the
  * config paths, and when any mtime differs from the previous observation
  * re-parses and applies the config; `start` reschedules the check every
  * `checkAfterMillis` (the reference's `call_later` self-rescheduling
  * loop). A parse failure is recorded on the context and the previous
  * config keeps serving. */
final class ConfigChangeObserver(ctx: ServerContext,
    configPaths: Seq[String], checkAfterMillis: Long = 1000) {

  @volatile private var lastStats: Option[Seq[Long]] = None
  @volatile private var lastCheckError: Option[Throwable] = None
  private var scheduler: Option[ScheduledExecutorService] = None
  private var task: Option[ScheduledFuture[_]] = None

  private def mtimes: Seq[Long] =
    configPaths.map(p => Files.getLastModifiedTime(Paths.get(p)).toMillis)

  private def changeDetected(last: Option[Seq[Long]], next: Seq[Long]): Boolean =
    last.exists(l => l.zip(next).exists { case (a, b) => a != b })

  /** Error of the most recent failed check (parse/stat), cleared on the
    * next successful one. A failed check never unloads what is serving. */
  def lastError: Option[Throwable] = lastCheckError

  /** One observation step. The FIRST check always loads (the reference's
    * observer is seeded by an explicit initial `server.update`; we fold
    * that in so construction-then-check is enough). Never throws — a
    * thrown exception would cancel the scheduleWithFixedDelay loop, i.e.
    * one bad config edit would permanently stop auto-reload. */
  def check(): Unit = try {
    val next = mtimes
    if (lastStats.isEmpty || changeDetected(lastStats, next)) {
      ctx.update(configPaths.flatMap(ServerConfig.parse))
    }
    lastStats = Some(next)
    lastCheckError = None
  } catch {
    case e: Exception => lastCheckError = Some(e)
  }

  def start(): Unit = synchronized {
    if (scheduler.isEmpty) {
      val s = Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-config-observer"); t.setDaemon(true); t
      })
      task = Some(s.scheduleWithFixedDelay(() => check(),
        0, checkAfterMillis, TimeUnit.MILLISECONDS))
      scheduler = Some(s)
    }
  }

  def stop(): Unit = synchronized {
    task.foreach(_.cancel(false))
    scheduler.foreach(_.shutdown())
    task = None
    scheduler = None
  }
}
