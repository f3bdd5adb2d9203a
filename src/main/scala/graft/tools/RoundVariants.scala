package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Micro-harness for the diskRound MACHINERY cost: same producer plan
  * (a pagerank-round-shaped broadcast join + agg over a persisted
  * 1M-edge frame), different write/read substrates. Isolates what part
  * of a round's wall time is compute vs rebalance vs parquet commit
  * extras, so the substrate change is measured, not guessed. */
object RoundVariants {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("roundvariants")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 1000000
    val edges = spark.range(n.toLong).select(
        (col("id") * 48271L % 35000L).as("src"),
        (col("id") * 69621L % 35000L).as("dst"))
      .repartition(col("src")).persist()
    edges.count()
    val vertices = edges.select(col("src").as("node")).distinct().persist()
    vertices.count()
    def round(): DataFrame = {
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      vertices.join(deg.select(col("src").as("node"), col("d")), Seq("node"), "left")
        .select(col("node"), coalesce(col("d"), lit(0L)).as("rank"))
    }
    var i = 0
    def path(tag: String): String = { i += 1; s"/tmp/rv-$tag-$i" }
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    round().write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { _ =>
      time("A compute-only-noop") { round().write.format("noop").mode("overwrite").save() }
      time("B rebalance+parquet (current diskRound)") {
        val p = path("b")
        round().hint("rebalance").write.mode(SaveMode.ErrorIfExists).parquet(p)
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
      }
      time("C plain parquet (no rebalance)") {
        val p = path("c")
        round().write.mode(SaveMode.ErrorIfExists).parquet(p)
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
      }
      time("D no-commit-extras rebalance") {
        val p = path("d")
        round().hint("rebalance").write.mode(SaveMode.ErrorIfExists)
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
          .option("parquet.summary.metadata.level", "NONE")
          .option("compression", "snappy")
          .parquet(p)
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
      }
      time("E no-commit-extras plain") {
        val p = path("e")
        round().write.mode(SaveMode.ErrorIfExists)
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
          .option("parquet.summary.metadata.level", "NONE")
          .option("compression", "snappy")
          .parquet(p)
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
      }
      time("F localCheckpoint (old substrate)") {
        round().localCheckpoint(true).write.format("noop").mode("overwrite").save()
      }
      time("G persist+count (recomputable cache)") {
        val d = round().persist()
        d.count()
        d.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
