package graft.gen

import graft.cube.Cube
import graft.operators.{SelectOps, SubsampleOps, TemporalOps}
import org.apache.spark.sql.functions._

/** The gen2 cube-generation pipeline (reference gen2/local/generator.py:
  * 117-241): a declarative `CubeConfig` compiled into ONE lazy DataFrame
  * DAG — subset (vars → bbox → time) → temporal resample → spatial
  * subsample — with the write as the only action. Catalyst sees the whole
  * chain, so pruning/pushdown cross the stage boundaries the reference
  * executes one-by-one.
  */
final case class CubeConfig(
    varNames: Option[Seq[String]] = None,
    bbox: Option[(Double, Double, Double, Double)] = None,
    timeRange: Option[(String, String)] = None,
    /** temporal bucket freq, e.g. "1D"/"1W"/"1M" (mean per cell). */
    timePeriod: Option[String] = None,
    /** spatial k×k block mean factor. */
    spatialK: Option[Int] = None)

object CubeGenerator {

  /** Apply the config's stages; every stage is optional and lazy. */
  def generate(cube: Cube, cfg: CubeConfig): Cube = {
    var c = SelectOps.selectSubset(cube, cfg.varNames, cfg.bbox, cfg.timeRange)

    cfg.timePeriod.foreach { freq =>
      val vars = c.varNames.filter(v =>
        c.df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      val agg = TemporalOps.resampleInTime(c.df, c.timeCol, freq,
        vars.map(v => v -> "mean"), extraKeys = Seq(c.yCol, c.xCol),
        labelCol = c.timeCol)
      val renamed = vars.foldLeft(agg) { (d, v) => d.withColumnRenamed(s"${v}_mean", v) }
      c = c.copy(df = renamed)
    }

    cfg.spatialK.foreach { k =>
      val vars = c.varNames.filter(v =>
        c.df.schema(v).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      val (agg, gm2) = SubsampleOps.subsample(c, k, vars.map(v => v -> "mean"))
      val renamed = vars.foldLeft(agg) { (d, v) => d.withColumnRenamed(s"${v}_mean", v) }
        .withColumn(c.xCol, gm2.xExpr(col("block_i")))
        .withColumn(c.yCol, gm2.yExpr(col("block_j")))
        .drop("block_i", "block_j")
      c = Cube(renamed, gm2, c.timeCol, c.yCol, c.xCol)
    }
    c
  }
}
