package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession

/** Named store-config pool (reference xcube/core/store/storepool.py):
  * the `new_data_store` factory (store.py:27-52), `DataStoreConfig`
  * (storepool.py:96-166), `DataStorePool` with lazily-created cached
  * instances (storepool.py:204-356), `@instance` resolution
  * (get_data_store_instance, storepool.py:23-64), and JSON/YAML config
  * documents (`from_file`/`from_dict`; the pool schema is one object
  * per instance id with `store_id`, `store_params`, `title`,
  * `description`).
  *
  * Scale note: the pool holds CONFIGS, not connections — instances are
  * thin catalog fronts over Spark readers, so a thousand-entry pool is
  * a thousand small maps on the driver and zero cluster state.
  */
object StorePool {

  /** `new_data_store` analog: construct a store from its registry id.
    * `file` (alias `fs`, `local`) takes `root` — any Hadoop-FS
    * protocol in the root works unchanged (file://, s3a://, the s3g
    * emulator, http index dirs), which is the reference's
    * per-protocol store matrix; `memory` takes no parameters. Unknown
    * ids decline loudly (reference DataStoreError). */
  def newDataStore(spark: SparkSession, storeId: String,
                   params: Map[String, String] = Map.empty): DataStore =
    storeId match {
      case "file" | "fs" | "local" | "s3" | "http" | "https" =>
        val root = params.getOrElse("root", throw new IllegalArgumentException(
          s"store '$storeId' requires a 'root' store parameter"))
        new FsDataStore(spark, root)
      case "memory" => new MemoryDataStore(spark)
      case other => throw new IllegalArgumentException(
        s"unknown data store '$other' — registered: " +
          "file, fs, local, s3, http, https, memory")
    }

  /** One pooled configuration (storepool.py DataStoreConfig). */
  final case class DataStoreConfig(storeId: String,
                                   params: Map[String, String] = Map.empty,
                                   title: Option[String] = None,
                                   description: Option[String] = None)

  /** A mutable pool of named store configurations; `getStore` creates
    * each instance ON FIRST USE and caches it (storepool.py
    * DataStoreInstance). Re-adding a config under an existing id drops
    * the cached instance so the next `getStore` reflects the new
    * config. */
  final class DataStorePool(spark: SparkSession,
                            initial: Seq[(String, DataStoreConfig)] = Nil) {
    private val configs =
      scala.collection.mutable.LinkedHashMap(initial: _*)
    private val instances =
      scala.collection.mutable.Map.empty[String, DataStore]

    def isEmpty: Boolean = configs.isEmpty
    def storeInstanceIds: Seq[String] = configs.keys.toSeq.sorted
    def hasStoreInstance(id: String): Boolean = configs.contains(id)

    def addStoreConfig(id: String, cfg: DataStoreConfig): Unit = {
      configs(id) = cfg
      instances.remove(id)
      ()
    }

    def removeStoreConfig(id: String): Unit = {
      configs.remove(id); instances.remove(id); ()
    }

    def getStoreConfig(id: String): DataStoreConfig =
      configs.getOrElse(id, throw new IllegalArgumentException(
        s"unknown store instance '$id' — configured: " +
          storeInstanceIds.mkString(", ")))

    def getStore(id: String): DataStore = {
      val cfg = getStoreConfig(id)
      instances.getOrElseUpdate(id,
        newDataStore(spark, cfg.storeId, cfg.params))
    }
  }

  /** `get_data_store_instance` (storepool.py:23-64): a `@`-prefixed id
    * resolves through the pool (params must be empty), anything else
    * constructs a fresh store. */
  def getDataStoreInstance(spark: SparkSession, storeId: String,
                           params: Map[String, String] = Map.empty,
                           pool: Option[DataStorePool] = None): DataStore =
    if (storeId.startsWith("@")) {
      val id = storeId.drop(1)
      require(pool.isDefined,
        s"store_pool must be given with store_id ('$storeId') " +
          "referring to a configured store")
      require(params.isEmpty,
        s"store_params cannot be given with store_id ('$storeId') " +
          "referring to a configured store")
      pool.get.getStore(id)
    } else newDataStore(spark, storeId, params)

  // ------------------------------------------------------------------
  // config documents
  // ------------------------------------------------------------------

  private def nodeToConfig(n: JsonNode): DataStoreConfig = {
    require(n.has("store_id") && n.get("store_id").asText().nonEmpty,
      "store config requires a non-empty 'store_id'")
    val params = Option(n.get("store_params")).map { p =>
      val b = Map.newBuilder[String, String]
      p.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
      b.result()
    }.getOrElse(Map.empty)
    DataStoreConfig(n.get("store_id").asText(), params,
      Option(n.get("title")).map(_.asText()),
      Option(n.get("description")).map(_.asText()))
  }

  private def fromNode(spark: SparkSession, root: JsonNode): DataStorePool = {
    require(root.isObject, "store-pool document must be a JSON object")
    val entries = Seq.newBuilder[(String, DataStoreConfig)]
    root.fields().forEachRemaining { e =>
      entries += e.getKey -> nodeToConfig(e.getValue)
    }
    new DataStorePool(spark, entries.result())
  }

  /** Pool from a JSON document string (storepool.py from_dict). */
  def fromJson(spark: SparkSession, json: String): DataStorePool =
    fromNode(spark, new ObjectMapper().readTree(json))

  /** Pool from a `.json`/`.yaml`/`.yml` file (storepool.py from_file). */
  def fromFile(spark: SparkSession, path: String): DataStorePool = {
    val lower = path.toLowerCase
    val yaml = lower.endsWith(".yaml") || lower.endsWith(".yml")
    if (!yaml && !lower.endsWith(".json"))
      throw new IllegalArgumentException(
        s"unrecognized store-pool config extension: $path (.json/.yaml/.yml)")
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    if (yaml)
      fromNode(spark, new ObjectMapper(
        new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
        .readTree(text))
    else fromJson(spark, text)
  }
}
