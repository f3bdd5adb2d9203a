package graft.tools

object BenchOne {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("benchone")
    val d = "/root/testdata/sf0.1"
    for (n <- a) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"TIMING $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
