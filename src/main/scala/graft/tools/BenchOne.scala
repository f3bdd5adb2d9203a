package graft.tools

object BenchOne {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("benchone")
    val d = "/root/testdata/sf0.1"
    for (n <- a) {
      // "bench:<name>" times the operator path (benchRun) the way
      // graft.Bench does; a bare name times the gate query (run)
      val (label, fn) =
        if (n.startsWith("bench:")) {
          val name = n.stripPrefix("bench:")
          val p = graft.queries.Probes.all.find(_.name == name)
            .getOrElse(sys.error(s"unknown probe: $name"))
          (n, p.benchRun.getOrElse(p.run))
        } else (n, graft.SparkEntry.queries(n))
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
