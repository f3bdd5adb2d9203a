package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: wall-time individual SparkEntry queries, two rounds
  * (cold JVM/cache + warm), e.g.
  * `sbt "runMain graft.TimeQ q78_pagerank,q103_triangles /root/testdata/sf0.1"`.
  * Not part of the driver contract (that's Verify/Bench/SparkEntry). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (round <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).collect().length
      println(f"[timeq] round=$round $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$cnt")
    }
    spark.stop()
  }
}
