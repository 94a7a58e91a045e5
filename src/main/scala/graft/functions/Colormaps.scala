package graft.functions

/** Colormap registry — the serving-side colormap families of the reference
  * (xcube/util/cmaps.py:31-448, applied from xcube/core/tile.py:355-763):
  * perceptually-uniform sequential families (viridis/plasma/inferno/magma/
  * cividis), classics (gray/jet), a diverging map (RdBu), and a categorical
  * palette (tab10), each addressable reversed via the matplotlib-style
  * `_r` suffix and an `_alpha` variant that fades small values to
  * transparent (cmaps.py get_alpha_cmap).
  *
  * Continuous maps are piecewise-linear over anchor stops (the control-point
  * form of matplotlib's LinearSegmentedColormap); categorical maps pick the
  * bin color without interpolation (BoundaryNorm behavior).
  */
object Colormaps {

  /** Packed 0xAARRGGBB. */
  type Argb = Int

  final case class Colormap(
      name: String,
      /** (position ∈ [0,1], 0xRRGGBB) anchors, ascending. */
      stops: Array[(Double, Int)],
      categorical: Boolean = false,
      /** fade alpha 0→255 over the lower half (the `_alpha` variants). */
      alphaRamp: Boolean = false) {

    require(stops.nonEmpty)

    /** Color at normalized position t ∈ [0,1]; NaN → fully transparent. */
    def argb(t: Double): Argb = {
      if (t.isNaN) return 0
      val x = math.max(0.0, math.min(1.0, t))
      val rgb =
        if (categorical) {
          val idx = math.min(stops.length - 1, (x * stops.length).toInt)
          stops(idx)._2
        } else {
          var k = 0
          while (k < stops.length - 1 && stops(k + 1)._1 < x) k += 1
          if (k >= stops.length - 1) stops.last._2
          else {
            val (p0, c0) = stops(k)
            val (p1, c1) = stops(k + 1)
            val f = if (p1 > p0) (x - p0) / (p1 - p0) else 0.0
            def lerp(sh: Int): Int = {
              val a = (c0 >> sh) & 0xff
              val b = (c1 >> sh) & 0xff
              math.round(a + f * (b - a)).toInt
            }
            (lerp(16) << 16) | (lerp(8) << 8) | lerp(0)
          }
        }
      val alpha =
        if (!alphaRamp) 0xff
        else math.min(255, math.round(math.min(1.0, 2.0 * x) * 255).toInt)
      (alpha << 24) | rgb
    }

    def reversed: Colormap =
      copy(name = name + "_r",
        stops = stops.reverse.map { case (p, c) => (1.0 - p, c) })

    def withAlphaRamp: Colormap = copy(name = name + "_alpha", alphaRamp = true)
  }

  private def cm(name: String, hexes: String*): Colormap = {
    val n = hexes.length
    Colormap(name, hexes.zipWithIndex.map { case (h, i) =>
      (if (n == 1) 0.0 else i.toDouble / (n - 1), Integer.parseInt(h, 16))
    }.toArray)
  }

  /** Sequential perceptually-uniform anchor points (5-point control form). */
  val viridis: Colormap = cm("viridis", "440154", "3b528b", "21918c", "5ec962", "fde725")
  val plasma: Colormap  = cm("plasma",  "0d0887", "7e03a8", "cc4778", "f89540", "f0f921")
  val inferno: Colormap = cm("inferno", "000004", "57106e", "bc3754", "f98e09", "fcffa4")
  val magma: Colormap   = cm("magma",   "000004", "51127c", "b73779", "fc8961", "fcfdbf")
  val cividis: Colormap = cm("cividis", "00224e", "4c6a76", "7d7c78", "b8a35b", "fee838")
  val gray: Colormap    = cm("gray", "000000", "ffffff")
  val jet: Colormap     = cm("jet", "00007f", "0000ff", "00ffff", "ffff00", "ff0000", "7f0000")
  val turbo: Colormap   = cm("turbo", "30123b", "28bceb", "a4fc3c", "f66b19", "7a0403")
  /** Diverging red-white-blue. */
  val rdBu: Colormap    = cm("RdBu", "67001f", "d6604d", "f7f7f7", "4393c3", "053061")
  val coolwarm: Colormap = cm("coolwarm", "3b4cc0", "8db0fe", "dddddd", "f49a7b", "b40426")
  val seismic: Colormap = cm("seismic", "00004c", "0000ff", "ffffff", "ff0000", "7f0000")
  val bwr: Colormap     = cm("bwr", "0000ff", "ffffff", "ff0000")
  /** Categorical 10-class palette. */
  val tab10: Colormap = Colormap("tab10",
    Array("1f77b4", "ff7f0e", "2ca02c", "d62728", "9467bd",
          "8c564b", "e377c2", "7f7f7f", "bcbd22", "17becf")
      .zipWithIndex.map { case (h, i) => (i / 10.0, Integer.parseInt(h, 16)) },
    categorical = true)

  private val base: Seq[Colormap] =
    Seq(viridis, plasma, inferno, magma, cividis, gray, jet, turbo,
      rdBu, coolwarm, seismic, bwr, tab10)

  /** name → colormap, including `_r` and `_alpha` variants. */
  val registry: Map[String, Colormap] = {
    val all = base.flatMap { c =>
      val r = c.reversed
      Seq(c, r, c.withAlphaRamp, r.withAlphaRamp)
    }
    all.map(c => c.name -> c).toMap
  }

  /** Parse a custom colormap JSON code — the reference's `parse_cm_code`
    * (cmaps.py:486-540): `{"name": ..., "type": "continuous"|"stepwise"|
    * "categorical", "colors": [[value, "#rrggbb"], ...]}`. Values are
    * normalized to [0,1]; stepwise/categorical maps hold each color until
    * the next stop (duplicated-stop encoding of the step function).
    */
  def parseCmCode(code: String): Colormap = {
    import scala.jdk.CollectionConverters._
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(code)
    val name = node.get("name").asText
    val typ = Option(node.get("type")).map(_.asText).getOrElse("continuous")
    val items = node.get("colors").elements.asScala.toVector.map { it =>
      val v = it.get(0).asDouble
      (v, Integer.parseInt(it.get(1).asText.stripPrefix("#"), 16))
    }.sortBy(_._1) // unsorted input would silently break the piecewise lerp
    require(items.nonEmpty, "custom colormap needs at least one color")
    val vmin = items.head._1
    val vmax = items.last._1
    val span = if (vmax > vmin) vmax - vmin else 1.0
    val norm = items.map { case (v, c) => ((v - vmin) / span, c) }
    val stops = typ match {
      case "stepwise" | "categorical" =>
        // each color holds until the next stop; the LAST item only closes
        // the final band (its color is unused), exactly like the reference's
        // stepwise expansion over items[0:-1] (cmaps.py:524-532)
        norm.indices.init.flatMap { i =>
          Seq(norm(i), (norm(i + 1)._1, norm(i)._2))
        }.toVector
      case _ => norm
    }
    Colormap(name, stops.toArray)
  }

  /** Lookup à la ColormapRegistry.get_cmap (cmaps.py:383-392): a JSON cm
    * code parses into a custom colormap; unknown names fall back to the
    * reference's default ("viridis" per DEFAULT_CMAP_NAME).
    */
  def get(name: String): Colormap =
    if (name.trim.startsWith("{")) parseCmCode(name)
    else registry.getOrElse(name, viridis)

  def names: Seq[String] = registry.keys.toSeq.sorted
}
