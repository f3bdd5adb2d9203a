package graft.tools

object Explain {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("explain")
    val d = "/root/testdata/sf0.001"
    for (n <- a) {
      println(s"========== $n ==========")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
