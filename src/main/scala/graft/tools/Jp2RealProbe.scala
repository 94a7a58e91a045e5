package graft.tools
import graft.sources.jp2._
import graft.sources.GeoTiffSource

object Jp2RealProbe {
  def main(args: Array[String]): Unit = {
    for (name <- Seq("sample-sb.jp2", "sample.jp2")) {
      val path = s"/root/reference/examples/serve/demo/$name"
      val t0 = System.nanoTime()
      val img = Jp2Source.decode(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      val dt = (System.nanoTime()-t0)/1e9
      println(f"$name: ${img.width}x${img.height} comps=${img.comps.length} depth=${img.depth} ($dt%.2f s)")
      for (c <- img.comps.indices) {
        val a = img.comps(c)
        val mn = a.min; val mx = a.max
        val mean = a.map(_.toLong).sum.toDouble / a.length
        println(f"  comp $c min=$mn max=$mx mean=$mean%.2f head=${a.take(12).mkString(",")}")
      }
    }
    // cross-validate against the GeoTIFF twin if dims match
    val tif = GeoTiffSource.parseAll(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/serve/demo/sample-geotiff.tif")))
    val t = tif.head
    println(s"sample-geotiff.tif: ${t.width}x${t.height} bands=${t.bands.length} head=${t.bands.head.take(12).mkString(",")}")
    val rgb = Jp2Source.decode(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/serve/demo/sample.jp2")))
    for (c <- 0 until 3) {
      val a = rgb.comps(c); val b = t.bands(c)
      var exact = 0L; var sumAbs = 0.0; var maxAbs = 0.0
      var within1 = 0L; var within2 = 0L
      var i = 0
      while (i < a.length) {
        val d = math.abs(a(i) - b(i))
        if (d == 0) exact += 1
        if (d <= 1) within1 += 1
        if (d <= 2) within2 += 1
        sumAbs += d; if (d > maxAbs) maxAbs = d
        i += 1
      }
      val n = a.length.toDouble
      println(f"  band $c vs jp2 comp $c: exact=${exact/n*100}%.2f%% within1=${within1/n*100}%.2f%% within2=${within2/n*100}%.2f%% meanAbs=${sumAbs/n}%.4f maxAbs=$maxAbs%.0f")
    }
    val sb = Jp2Source.decode(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/serve/demo/sample-sb.jp2")))
    // single-band vs luminance-ish: just compare against band 0 for orientation sanity
    val a = sb.comps(0); val b0 = t.bands(0)
    var corrN = 0.0; var sa=0.0; var sb2=0.0; var sab=0.0; var saa=0.0; var sbb=0.0
    var i = 0
    while (i < a.length) { val x=a(i).toDouble; val y=b0(i); sa+=x; sb2+=y; sab+=x*y; saa+=x*x; sbb+=y*y; corrN+=1; i+=1 }
    val corr = (sab - sa*sb2/corrN) / math.sqrt((saa - sa*sa/corrN)*(sbb - sb2*sb2/corrN))
    println(f"  sample-sb vs tif band0 correlation=$corr%.4f")
  }
}
