package graft.sources.zarr

import graft.sources.{DataStore, KerchunkSource}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataTypes, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A Spark `TableCatalog` over a graft data store directory — the
  * Spark-native face of the reference's store/catalog API
  * (`store/store.py:27-52` list/describe/open): register it once,
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.zarr.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.path", "/archive")
  * spark.sql("SELECT avg(v) FROM graft.`cube.zarr` WHERE t = 0.5")
  * }}}
  *
  * and every cube in the directory is a SQL table. Entries resolve by the
  * store's extension inference to the connector TABLES (not eager reads):
  * `.zarr` groups, `.nc` granules, `.tif`/`.tiff` rasters and
  * `.refs.json` reference documents all open through [[ZarrTable]]'s one
  * scan engine, so catalog queries get pushed-filter chunk pruning,
  * variable pruning, runtime filtering, and statistics exactly like
  * `spark.read.format(...)` calls. Raw reference documents open LAZILY
  * (bounded driver memory at any archive size).
  *
  * Row-shaped entries (parquet/csv/orc/json) are listed but load through
  * Spark's own readers — `loadTable` says so rather than wrapping them.
  * The catalog is a VIEW of the directory: `createTable` points at
  * `df.write.format("zarr")`, `dropTable` deletes the entry.
  *
  * Maintenance gets a SQL face through DSv2 PROCEDURES — Spark refuses
  * `ANALYZE TABLE` on v2 tables, so the stats tier's SQL entry is
  *
  * {{{
  * spark.sql("CALL graft.analyze(entry => 'cube.zarr')")
  * }}}
  *
  * which runs the distributed per-chunk statistics pass
  * ([[graft.operators.MaintenanceOps.analyzeStore]] /
  * [[ChunkStats.analyze]]) and returns the sidecar path; zarr groups and
  * granule archives (sidecar beside the index) both resolve. An optional
  * `format => 'parquet'` writes the distributed side table instead of
  * the inline json document.
  */
final class GraftCatalog extends CatalogPlugin with TableCatalog
    with ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.path=<store dir>"))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty,
      s"store catalogs are flat — got namespace ${namespace.mkString(".")}")
    val bs = graft.sources.ByteStore.current
    bs.list(root).map(_._1).filterNot(_.startsWith("_")).sorted
      .map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty &&
      graft.sources.ByteStore.current.exists(s"$root/${ident.name}")

  override def loadTable(ident: Identifier): Table = {
    val path = s"$root/${ident.name}"
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    // directory entries probe by CONTENT before extension inference (the
    // DataStore.openDataset discipline, via the shared DirProbe so the
    // catalog and the providers agree): a Sentinel-3 product, a zarr
    // group without the .zarr suffix, and a granule archive all resolve
    // to connector tables on the shared scan engine — over local AND
    // ByteStore-scheme'd roots (the header scanners read through
    // ByteStore, so bucket-hosted products and archives open in place)
    DirProbe.probe(path) match {
      case DirProbe.ZarrGroup => return ZarrTable(ZarrTable.open(path))
      case DirProbe.Sentinel3 =>
        return ZarrTable(ZarrTable.openRefs(
          KerchunkSource.parseJson(new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(graft.sources.Sentinel3Source.scanRefs(path))), path))
      case DirProbe.Archive =>
        // honors whatever index format the archive was last built with
        // (manifestFormat), defaulting new indexes to json
        return ZarrTable(ZarrTable.openArchive(path, concatDim = "t",
          indexDir = None,
          indexFormat = KerchunkSource.manifestFormat(path)))
      case DirProbe.NotSpecial => ()
    }
    DataStore.formatFor(path) match {
      case "zarr" => ZarrTable(ZarrTable.open(path))
      case "kerchunk" => ZarrTable(ZarrTable.openRefsLazy(path))
      case "netcdf" => ZarrTable(ZarrTable.openRefs(
        KerchunkSource.parseJson(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(KerchunkSource.scanAuto(path))), path))
      case "geotiff" => ZarrTable(ZarrTable.openRefs(
        KerchunkSource.parseJson(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(KerchunkSource.scanGeoTiff(path))), path))
      case other => throw new UnsupportedOperationException(
        s"$path is a row-shaped dataset ($other) — read it with " +
          s"spark.read.${other}(...); the catalog serves the cube formats")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"create cubes with df.write.format(\"zarr\").option(\"dims\", ...)" +
        s".save(\"$root/${ident.name}\") — the catalog reflects the directory")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "cube metadata is store-managed (MaintenanceOps); alterTable is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val bs = graft.sources.ByteStore.current
    val path = s"$root/${ident.name}"
    bs.walkFiles(path).foreach(rel => bs.delete(s"$path/$rel"))
    bs.delete(path)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "rename the store entry with the filesystem/object-store tools")

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty,
      s"store catalogs are flat — got namespace ${namespace.mkString(".")}")
    Array(Identifier.of(Array.empty, "analyze"))
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.isEmpty && ident.name.equalsIgnoreCase("analyze"),
      s"unknown procedure ${ident.name} — this catalog serves `analyze`")
    GraftCatalog.AnalyzeProcedure(root)
  }
}

object GraftCatalog {

  /** `CALL <catalog>.analyze(entry => 'name'[, format => 'parquet'])` —
    * the SQL entry of the ANALYZE tier. Routes by the same content probe
    * as `loadTable`: a zarr group analyzes in place, a granule archive
    * analyzes through its persisted index (sidecar beside the index).
    * Returns one row: the sidecar document's path. */
  private[zarr] final case class AnalyzeProcedure(root: String)
      extends UnboundProcedure with BoundProcedure {

    override def name(): String = "analyze"

    override def description(): String =
      "distributed per-chunk value statistics into the _graft_stats " +
        "sidecar: value-predicate chunk pruning, zero-IO statistics, " +
        "zone-map top-n"

    override def bind(inputType: StructType): BoundProcedure = this

    override def isDeterministic: Boolean = false // writes the sidecar

    override def parameters(): Array[ProcedureParameter] = Array(
      ProcedureParameter.in("entry", DataTypes.StringType)
        .comment("store entry name (zarr group or granule archive)")
        .build(),
      ProcedureParameter.in("format", DataTypes.StringType)
        .defaultValue("'json'")
        .comment("sidecar form: json (inline) or parquet (side table)")
        .build())

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val format = input.getUTF8String(1).toString
      val spark = org.apache.spark.sql.SparkSession.active
      val path = s"$root/$table"
      val out = DirProbe.probe(path) match {
        case DirProbe.ZarrGroup =>
          ChunkStats.analyze(spark, path, format = format)
        case DirProbe.Archive =>
          ChunkStats.analyzeArchive(spark, path,
            indexFormat = KerchunkSource.manifestFormat(path),
            format = format)
        case DirProbe.NotSpecial
            if DataStore.formatFor(path) == "zarr" =>
          ChunkStats.analyze(spark, path, format = format)
        case _ => throw new UnsupportedOperationException(
          s"$path: ANALYZE serves chunked cube entries (zarr groups, " +
            "granule archives); row-shaped formats carry engine-native " +
            "statistics already")
      }
      java.util.Collections.singletonList(
        AnalyzeResultScan(out): Scan).iterator()
    }
  }

  private final case class AnalyzeResultScan(path: String) extends LocalScan {
    override def readSchema(): StructType =
      StructType(Seq(StructField("stats_path", DataTypes.StringType,
        nullable = false)))
    override def rows(): Array[InternalRow] =
      Array(new GenericInternalRow(
        Array[Any](UTF8String.fromString(path))))
  }
}
