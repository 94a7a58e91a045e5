package graft.gen

import graft.cube.GridMapping
import graft.operators.SpatialOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** gen1 `InputProcessor` plugin surface (reference xcube/core/gen/
  * iproc.py:126-551): a per-input-format extension point for the
  * slice-streaming cube generator. Each processor names the reader it
  * needs (`inputReader`), derives the granule's time range, and hooks
  * three stages around the spatial step:
  *
  *   pre_process → process (spatial transform onto the target grid) →
  *   post_process
  *
  * The reference registers processors as entry-point extensions
  * (iproc.py:60-118, `register_input_processor`); here the registry is
  * an in-process map with the same lookup-by-name contract, and the
  * default processor is the `XYInputProcessor` analog (iproc.py:268-
  * 379): identity pre/post hooks, time range from the time coordinate,
  * and the resampling dispatcher as the spatial step.
  *
  * All hooks are DataFrame → DataFrame — they compose into ONE logical
  * plan per granule, so a masking pre-hook becomes a pushable filter
  * and the whole per-granule pipeline stays a single Spark job at any
  * granule size.
  */
trait InputProcessor {
  def name: String
  /** DataStore format id this processor reads (iproc.py `input_reader`). */
  def inputReader: String
  /** (start, stop) in DAYS SINCE 1970 — iproc.py:169's contract — or
    * None when the granule carries no time axis. */
  def getTimeRange(df: DataFrame): Option[(Double, Double)]
  /** Variables the pre/process steps need that subsetting must keep
    * (iproc.py get_extra_vars). */
  def extraVars(df: DataFrame): Seq[String] = Nil
  /** Validation / masking / filtering before the spatial step. */
  def preProcess(df: DataFrame): DataFrame = df
  /** Spatial transformation onto the target grid (iproc.py process).
    * Input rows carry (i, j, vars...) on `srcGm`; output likewise on
    * `tgtGm`. */
  def process(df: DataFrame, srcGm: GridMapping, tgtGm: GridMapping,
              vars: Seq[String], resampling: String): DataFrame =
    SpatialOps.resampleInSpace(SpatialOps.RegularSource(df, srcGm), tgtGm,
      vars,
      splineOrder = if (resampling == "Nearest") 0 else 1,
      aggregator = Some("mean"))
  /** Final fix-ups after the spatial step. */
  def postProcess(df: DataFrame): DataFrame = df
}

/** The default XY processor (iproc.py:268-379 `XYInputProcessor` +
  * :382-466 `DefaultInputProcessor`): time range from the epoch-seconds
  * time column, identity hooks, dispatcher spatial step. */
class DefaultInputProcessor(
    override val inputReader: String = "netcdf",
    timeCol: String = "time") extends InputProcessor {
  override def name: String = "default"
  override def getTimeRange(df: DataFrame): Option[(Double, Double)] =
    if (!df.columns.contains(timeCol)) None
    else {
      val r = df.agg(min(col(timeCol).cast("double")),
        max(col(timeCol).cast("double"))).head()
      if (r.isNullAt(0)) None
      else Some((r.getDouble(0) / 86400.0, r.getDouble(1) / 86400.0))
    }
}

object InputProcessors {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InputProcessor]()
  register(new DefaultInputProcessor())

  /** register_input_processor (iproc.py:97). Last registration wins,
    * like re-registering an extension. */
  def register(p: InputProcessor): Unit = { registry.put(p.name, p); () }

  /** get_input_processor_class analog (iproc.py:104-118): loud lookup. */
  def get(name: String): InputProcessor =
    Option(registry.get(name)).getOrElse(throw new IllegalArgumentException(
      s"unknown input processor '$name' — registered: " +
        registry.keySet().toArray.mkString(", ")))

  def names: Seq[String] =
    registry.keySet().toArray.map(_.toString).toSeq.sorted

  /** gen1 generator core (reference gen/gen.py `gen_cube`, driven by the
    * processor's hook order): per input granule — open through the
    * processor's reader, pre-process, spatial step onto `tgtGm`,
    * post-process, stamp the granule's derived time label — then union
    * all slices into one (time, i, j, vars...) frame. Each granule is an
    * independent plan branch (no cross-granule shuffle), so the union
    * parallelizes across granules like the reference's per-input loop
    * without its per-slice writes. */
  def genCube(spark: SparkSession, inputs: Seq[String], processorName: String,
              srcGm: GridMapping, tgtGm: GridMapping, vars: Seq[String],
              resampling: String = "Nearest",
              toIj: DataFrame => DataFrame = identity,
              timeLabels: Map[String, Double] = Map.empty): DataFrame = {
    require(inputs.nonEmpty, "gen: no input granules")
    val p = get(processorName)
    inputs.map { path =>
      val raw = graft.sources.DataStore.openDataset(spark, path)
      val tr = p.getTimeRange(raw)
      // a granule with NO derivable time axis and no explicit label
      // declines loudly — defaulting to epoch would collapse every such
      // slice under one indistinguishable 1970-01-01 stamp
      val centerDays = tr.map { case (a, b) => (a + b) / 2 }
        .orElse(timeLabels.get(path))
        .getOrElse(throw new IllegalArgumentException(
          s"gen: granule '$path' has no time axis the '$processorName' " +
            "processor can read and no explicit timeLabels entry — " +
            "label it, or fix the granule's time metadata"))
      val pre = p.preProcess(toIj(raw))
      val out = p.process(pre, srcGm, tgtGm, vars, resampling)
      p.postProcess(out)
        .withColumn("time",
          timestamp_seconds(lit(centerDays * 86400.0)))
    }.reduce(_ unionByName _)
  }
}
