package graft.tools
import org.apache.spark.sql.functions._
object RankProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("rankprobe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (0 until 200000).map(i => ((i * 2654435761L) % 1000003, i.toLong))
      .toDF("k", "tie").repartition(16)
    val ranked = graft.operators.Relational.globalRank(df, Seq(col("k"), col("tie")))
    ranked.collect()
    val p = ranked.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val ids = """ShuffleQueryStage (\d+)""".r.findAllMatchIn(p).map(_.group(1)).toList
    println("SHUFFLE_STAGE_IDS " + ids.mkString(","))
    println("RANGE_STAGES_DEDUPED " + (ids.size != ids.distinct.size))
    println(p)
  }
}
