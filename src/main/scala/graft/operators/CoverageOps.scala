package graft.operators

import graft.cube.Cube
import org.apache.spark.sql.functions._

/** OWS Coverages request execution — the reference's coverage pipeline
  * (xcube/webapi/ows/coverages/controllers.py:54-178: _apply_properties →
  * _apply_subsetting → CoverageScaling.apply, request parsing in
  * request.py:23-120, scaling.py:15-170) composed from the cube operators:
  * variable subset → bbox + datetime subset → block-mean downscale.
  *
  * The whole request compiles to ONE declarative plan: the property and
  * bbox/time subsets are prunable filters/projections, and the scaling is a
  * single map-side-combined groupBy on the (time, block) key — no staging of
  * intermediate datasets.
  */
object CoverageOps {

  /** The subset of OGC coverage-request parameters that affect data
    * (request.py:23-28): `properties` selects variables, `bbox` + `datetime`
    * subset, `scaleFactor` downscales (2 → half resolution, scaling.py:84).
    */
  final case class CoverageRequest(
      properties: Option[Seq[String]] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      datetime: Option[(String, String)] = None,
      scaleFactor: Option[Double] = None)

  /** Execute a coverage request against a cube (get_coverage_data,
    * controllers.py:54-178). Scaling uses the mean aggregator for every
    * requested variable (the reference resamples through
    * `resample_in_space`, which defaults float vars to mean on downscale).
    */
  def getCoverageData(cube: Cube, req: CoverageRequest): Cube = {
    val subset = SelectOps.selectSubset(cube, req.properties, req.bbox, req.datetime)
    req.scaleFactor match {
      case Some(f) if f > 1.0 =>
        val k = math.max(1, math.round(f).toInt)
        val vars = subset.varNames
        val (blocks, gm2) = SubsampleOps.subsample(subset, k, vars.map(_ -> "mean"))
        // re-expose block keys as cell-center coordinates of the scaled grid
        val df = blocks.select(
          (col(subset.timeCol) +:
            gm2.yExpr(col("block_j")).as(subset.yCol) +:
            gm2.xExpr(col("block_i")).as(subset.xCol) +:
            vars.map(v => col(s"${v}_mean").as(v))): _*)
        Cube(df, gm2, subset.timeCol, subset.yCol, subset.xCol)
      case _ => subset
    }
  }
}
