package graft.tools
object RefProbe {
  def main(args: Array[String]): Unit = {
    val h5 = "/root/reference/examples/notebooks/inputdata/O_L2_0001_SNS_2017104102450_v1.0.nc"
    val nc3 = "/root/reference/test/core/gen/inputdata/20170101120000-UKMO-L4_GHRSST-SSTfnd-OSTIAanom-GLOB-v02.0-fv02.0.nc"
    def stats(name: String, a: Array[Double]): Unit = {
      val ok = a.filter(x => !x.isNaN)
      println(f"$name: n=${a.length} valid=${ok.length} min=${if (ok.nonEmpty) ok.min else 0}%.6f max=${if (ok.nonEmpty) ok.max else 0}%.6f sum=${ok.sum}%.6f")
    }
    println("=== NetCDF-3 decode ===")
    val nc = graft.sources.NetcdfSource.read(nc3)
    for (v <- Seq("analysed_sst", "sst_anomaly", "lat", "lon", "time"))
      stats(v, nc.varByName(v).data)
    println("=== HDF5 decode ===")
    val h = graft.sources.NetcdfSource.read(h5)
    println("vars=" + h.vars.map(_.name).sorted.mkString(","))
    for (v <- Seq("conc_chl", "rtoa_2", "lat", "lon", "TP_latitude", "y", "x"))
      try stats(v, h.varByName(v).data)
      catch { case e: Throwable => println(s"$v: FAIL $e") }
  }
}
