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
      /** (position ∈ [0,1], 0xAARRGGBB) anchors, ascending. An alpha of 0
        * in all stops (the pre-alpha 0xRRGGBB form) reads as opaque.
        */
      stops: Array[(Double, Int)],
      categorical: Boolean = false,
      /** fade alpha 0→255 over the lower half (the `_alpha` variants). */
      alphaRamp: Boolean = false) {

    require(stops.nonEmpty)

    private val anyAlpha = stops.exists(s => (s._2 >>> 24) != 0)

    /** Color at normalized position t ∈ [0,1]; NaN → fully transparent. */
    def argb(t: Double): Argb = {
      if (t.isNaN) return 0
      val x = math.max(0.0, math.min(1.0, t))
      val argb0 =
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
              val a = (c0 >>> sh) & 0xff
              val b = (c1 >>> sh) & 0xff
              math.round(a + f * (b - a)).toInt
            }
            (lerp(24) << 24) | (lerp(16) << 16) | (lerp(8) << 8) | lerp(0)
          }
        }
      val baseAlpha = if (anyAlpha) (argb0 >>> 24) & 0xff else 0xff
      val alpha =
        if (!alphaRamp) baseAlpha
        else math.min(baseAlpha,
          math.round(math.min(1.0, 2.0 * x) * baseAlpha).toInt)
      (alpha << 24) | (argb0 & 0xffffff)
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

  /** Continuous map with explicit anchor positions (for maps whose stops
    * are not evenly spaced, e.g. `hot`, `terrain`).
    */
  private def cmAt(name: String, stops: (Double, String)*): Colormap =
    Colormap(name, stops.map { case (p, h) => (p, Integer.parseInt(h, 16)) }.toArray)

  private def cat(name: String, hexes: String*): Colormap =
    Colormap(name, hexes.zipWithIndex.map { case (h, i) =>
      (i.toDouble / hexes.length, Integer.parseInt(h, 16))
    }.toArray, categorical = true)

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

  // ---- the named long tail (cmaps.py registers the full matplotlib
  // registry grouped by family; these are the same names with 5-anchor
  // control points — ColorBrewer hexes where the map IS ColorBrewer,
  // closed-form values for the analytic maps, documented approximations
  // for the remaining perceptual ones)

  /** ColorBrewer multi-hue sequential (classes 1,3,5,7,9 of the 9-class
    * schemes — the exact published palette values).
    */
  private val cbSequential: Seq[Colormap] = Seq(
    cm("Blues", "f7fbff", "c6dbef", "6baed6", "2171b5", "08306b"),
    cm("Greens", "f7fcf5", "c7e9c0", "74c476", "238b45", "00441b"),
    cm("Greys", "ffffff", "d9d9d9", "969696", "525252", "000000"),
    cm("Oranges", "fff5eb", "fdd0a2", "fd8d3c", "d94801", "7f2704"),
    cm("Purples", "fcfbfd", "dadaeb", "9e9ac8", "6a51a3", "3f007d"),
    cm("Reds", "fff5f0", "fcbba1", "fb6a4a", "cb181d", "67000d"),
    cm("YlOrBr", "ffffe5", "fee391", "fe9929", "cc4c02", "662506"),
    cm("YlOrRd", "ffffcc", "fed976", "fd8d3c", "e31a1c", "800026"),
    cm("OrRd", "fff7ec", "fdd49e", "fc8d59", "d7301f", "7f0000"),
    cm("PuRd", "f7f4f9", "d4b9da", "df65b0", "ce1256", "67001f"),
    cm("RdPu", "fff7f3", "fcc5c0", "f768a1", "ae017e", "49006a"),
    cm("BuPu", "f7fcfd", "bfd3e6", "8c96c6", "88419d", "4d004b"),
    cm("GnBu", "f7fcf0", "ccebc5", "7bccc4", "2b8cbe", "084081"),
    cm("PuBu", "fff7fb", "d0d1e6", "74a9cf", "0570b0", "023858"),
    cm("YlGnBu", "ffffd9", "c7e9b4", "41b6c4", "225ea8", "081d58"),
    cm("PuBuGn", "fff7fb", "d0d1e6", "67a9cf", "02818a", "014636"),
    cm("BuGn", "f7fcfd", "ccece6", "66c2a4", "238b45", "00441b"),
    cm("YlGn", "ffffe5", "d9f0a3", "78c679", "238443", "004529"))

  /** ColorBrewer diverging (classes 1,3,6,9,11 of the 11-class schemes). */
  private val cbDiverging: Seq[Colormap] = Seq(
    cm("PiYG", "8e0152", "de77ae", "f7f7f7", "7fbc41", "276419"),
    cm("PRGn", "40004b", "c2a5cf", "f7f7f7", "a6dba0", "00441b"),
    cm("BrBG", "543005", "bf812d", "f5f5f5", "35978f", "003c30"),
    cm("PuOr", "7f3b08", "e08214", "f7f7f7", "8073ac", "2d004b"),
    cm("RdGy", "67001f", "d6604d", "ffffff", "878787", "1a1a1a"),
    cm("RdYlBu", "a50026", "f46d43", "ffffbf", "74add1", "313695"),
    cm("RdYlGn", "a50026", "f46d43", "ffffbf", "66bd63", "006837"),
    cm("Spectral", "9e0142", "f46d43", "ffffbf", "66c2a5", "5e4fa2"))

  /** The analytic "Sequential (2)" maps — closed-form channel ramps, so
    * the anchor values below are exact samples of the defining formulas.
    */
  private val analytic: Seq[Colormap] = Seq(
    cm("binary", "ffffff", "000000"),
    cm("gist_yarg", "ffffff", "000000"),
    cm("gist_gray", "000000", "ffffff"),
    cm("spring", "ff00ff", "ffff00"),
    cm("summer", "008066", "ffff66"),
    cm("autumn", "ff0000", "ffff00"),
    cm("winter", "0000ff", "00ff80"),
    cm("cool", "00ffff", "ff00ff"),
    cmAt("hot", 0.0 -> "000000", 0.365 -> "ff0000", 0.746 -> "ffff00", 1.0 -> "ffffff"),
    cm("afmhot", "000000", "800000", "ff8000", "ffff80", "ffffff"),
    cm("gist_heat", "000000", "600000", "bf0000", "ff8000", "ffffff"),
    cm("copper", "000000", "4f321f", "9d633f", "ec955f", "ffc77f"),
    cm("bone", "000000", "2e2e40", "667987", "a3bcbc", "ffffff"),
    cm("pink", "1e0000", "996666", "cc9e8c", "e6ccb0", "ffffff"),
    cm("Wistia", "e4ff7a", "ffe81a", "ffc11f", "ff9e0c", "fc7f00"))

  /** Cyclic maps (anchor approximations; ends meet by construction). */
  private val cyclic: Seq[Colormap] = Seq(
    cm("hsv", "ff0000", "ffff00", "00ff00", "00ffff", "0000ff", "ff00ff", "ff0000"),
    cm("twilight", "e2d9e2", "7f7dba", "2d1e3e", "b0605e", "e2d9e2"),
    cm("twilight_shifted", "2d1e3e", "7f7dba", "e2d9e2", "b0605e", "2d1e3e"))

  /** Qualitative palettes (exact published values). */
  private val qualitative: Seq[Colormap] = Seq(
    cat("Set1", "e41a1c", "377eb8", "4daf4a", "984ea3", "ff7f00", "ffff33",
      "a65628", "f781bf", "999999"),
    cat("Set2", "66c2a5", "fc8d62", "8da0cb", "e78ac3", "a6d854", "ffd92f",
      "e5c494", "b3b3b3"),
    cat("Set3", "8dd3c7", "ffffb3", "bebada", "fb8072", "80b1d3", "fdb462",
      "b3de69", "fccde5", "d9d9d9", "bc80bd", "ccebc5", "ffed6f"),
    cat("Pastel1", "fbb4ae", "b3cde3", "ccebc5", "decbe4", "fed9a6", "ffffcc",
      "e5d8bd", "fddaec", "f2f2f2"),
    cat("Pastel2", "b3e2cd", "fdcdac", "cbd5e8", "f4cae4", "e6f5c9", "fff2ae",
      "f1e2cc", "cccccc"),
    cat("Dark2", "1b9e77", "d95f02", "7570b3", "e7298a", "66a61e", "e6ab02",
      "a6761d", "666666"),
    cat("Accent", "7fc97f", "beaed4", "fdc086", "ffff99", "386cb0", "f0027f",
      "bf5b17", "666666"),
    cat("Paired", "a6cee3", "1f78b4", "b2df8a", "33a02c", "fb9a99", "e31a1c",
      "fdbf6f", "ff7f00", "cab2d6", "6a3d9a", "ffff99", "b15928"),
    cat("tab20", "1f77b4", "aec7e8", "ff7f0e", "ffbb78", "2ca02c", "98df8a",
      "d62728", "ff9896", "9467bd", "c5b0d5", "8c564b", "c49c94", "e377c2",
      "f7b6d2", "7f7f7f", "c7c7c7", "bcbd22", "dbdb8d", "17becf", "9edae5"),
    cat("tab20b", "393b79", "5254a3", "6b6ecf", "9c9ede", "637939", "8ca252",
      "b5cf6b", "cedb9c", "8c6d31", "bd9e39", "e7ba52", "e7cb94", "843c39",
      "ad494a", "d6616b", "e7969c", "7b4173", "a55194", "ce6dbd", "de9ed6"),
    cat("tab20c", "3182bd", "6baed6", "9ecae1", "c6dbef", "e6550d", "fd8d3c",
      "fdae6b", "fdd0a2", "31a354", "74c476", "a1d99b", "c7e9c0", "756bb1",
      "9e9ac8", "bcbddc", "dadaeb", "636363", "969696", "bdbdbd", "d9d9d9"))

  /** Miscellaneous (terrain's anchors are its published control points). */
  private val misc: Seq[Colormap] = Seq(
    cmAt("terrain", 0.0 -> "333399", 0.15 -> "0099ff", 0.25 -> "00cc66",
      0.5 -> "ffff99", 0.75 -> "805c54", 1.0 -> "ffffff"),
    cm("cubehelix", "000000", "1a3554", "307d49", "ca7b8e", "ffffff"))

  private val base: Seq[Colormap] =
    Seq(viridis, plasma, inferno, magma, cividis, gray, jet, turbo,
      rdBu, coolwarm, seismic, bwr, tab10) ++
      cbSequential ++ cbDiverging ++ analytic ++ cyclic ++ qualitative ++ misc

  /** Family grouping, mirroring the reference's registry sections
    * (cmaps.py groups the matplotlib registry the same way for the
    * server's colormap listing endpoint).
    */
  val families: Map[String, Seq[String]] = Map(
    "Perceptually Uniform Sequential" ->
      Seq("viridis", "plasma", "inferno", "magma", "cividis"),
    "Sequential" -> cbSequential.map(_.name),
    "Sequential (2)" -> (analytic.map(_.name) :+ "gray"),
    "Diverging" -> (cbDiverging.map(_.name) ++ Seq("RdBu", "coolwarm", "seismic", "bwr")),
    "Cyclic" -> cyclic.map(_.name),
    "Qualitative" -> (qualitative.map(_.name) :+ "tab10"),
    "Miscellaneous" -> (misc.map(_.name) ++ Seq("jet", "turbo")))

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

  /** Parse a SNAP *.cpd custom colormap — the reference's only supported
    * custom colormap FILE format (cmaps.py:666-755,
    * `load_snap_cpd_colormap`): `key=value` lines with `#` comments,
    * `numPoints`, and per-point `sample{i}` (float) / `color{i}`
    * (`r,g,b[,a]`). Samples min-max normalize to the [0,1] stops of a
    * linear map (isLogScaled is ignored, matching the reference's
    * commented-out handling).
    */
  def parseSnapCpd(name: String, content: String): Colormap = {
    val entries = content.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"illegal SNAP *.cpd line: $l")
        (l.take(i).trim, l.drop(i + 1).trim)
      }.toMap
    val n = entries.getOrElse("numPoints",
      throw new IllegalArgumentException("illegal SNAP *.cpd: no numPoints")).toInt
    require(n > 0, "illegal SNAP *.cpd: numPoints < 1")
    val pts = (0 until n).map { i =>
      val rgba = entries.getOrElse(s"color$i", "").split(",").map(_.trim.toInt)
      require(rgba.length == 3 || rgba.length == 4,
        s"illegal SNAP *.cpd color$i")
      val a = if (rgba.length == 4) rgba(3) else 255
      (entries(s"sample$i").toDouble,
        (a << 24) | (rgba(0) << 16) | (rgba(1) << 8) | rgba(2))
    }
    val vmin = pts.map(_._1).min
    val vmax = pts.map(_._1).max
    val span = if (vmax > vmin) vmax - vmin else 1.0
    Colormap(name,
      pts.map { case (s, c) => ((s - vmin) / span, c) }.sortBy(_._1).toArray)
  }

  /** Load a SNAP *.cpd file; the colormap takes the file's basename. */
  def loadSnapCpd(path: String): Colormap = {
    val f = new java.io.File(path)
    parseSnapCpd(f.getName.stripSuffix(".cpd"),
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
  }

  /** Lookup à la ColormapRegistry.get_cmap (cmaps.py:383-392): a JSON cm
    * code parses into a custom colormap, a `*.cpd` path loads a SNAP
    * custom colormap file; unknown names fall back to the reference's
    * default ("viridis" per DEFAULT_CMAP_NAME).
    */
  def get(name: String): Colormap =
    if (name.trim.startsWith("{")) parseCmCode(name)
    else if (name.endsWith(".cpd")) loadSnapCpd(name)
    else registry.getOrElse(name, viridis)

  def names: Seq[String] = registry.keys.toSeq.sorted
}
