package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scratch: re-measure selected sweep ops at one replication level
  * in a FRESH JVM (the full sweep reuses one session for 60+ timed
  * bodies — this isolates any session-accumulation effect). */
object SweepCheck {
  def main(a: Array[String]): Unit = {
    val d = a.headOption.getOrElse("/tmp/graft_scale/x16")
    val spark = graft.GraftSession.getOrCreate("sweepcheck")
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val o = spark.read.parquet(s"$d/orders.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(tag: String)(body: => Unit): Unit = {
      body
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"CHECK $tag ${ts.sorted.apply(1)}%.3f s  (all: ${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    med("agg_groupby") {
      noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"),
          avg("l_extendedprice").as("p"), count(lit(1)).as("n")))
    }
    med("join_shuffle") {
      noop(o.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s")))
    }
    med("pagerank_5it") {
      val cp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")).distinct()
      val edges = cp.unionByName(
        cp.select(col("dst").as("src"), col("src").as("dst")))
      noop(graft.operators.Graph.pagerankMicro(edges, iters = 5))
    }
    med("label_prop_3it") {
      val cp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst")).distinct()
      val edges = cp.unionByName(
        cp.select(col("dst").as("src"), col("src").as("dst")))
      noop(graft.operators.Graph.labelPropagation(edges, iters = 3))
    }
    spark.stop()
  }
}
