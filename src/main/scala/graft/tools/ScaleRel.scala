package graft.tools

/** Dev tool: relational scale probe on synthesized N-x copies of the
  * sf0.1 corpus (ids offset per replica so keys stay distinct). */
object ScaleRel {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.GraftSession.getOrCreate("scale-rel")
    val mult = a.headOption.map(_.toInt).getOrElse(16)
    val d = "/root/testdata/sf0.1"
    val li = graft.sources.Tables.lineitem(spark, d)
    val o  = graft.sources.Tables.orders(spark, d)
    val bigLi = (0 until mult).map(i => li.withColumn("l_orderkey", col("l_orderkey") + i * 10000000L))
      .reduce(_ unionByName _)
    val bigO = (0 until mult).map(i => o
      .withColumn("o_orderkey", col("o_orderkey") + i * 10000000L)
      .withColumn("o_custkey", col("o_custkey") + (i % 4) * 1000000L))
      .reduce(_ unionByName _)
    bigLi.write.mode("overwrite").parquet("/tmp/big_li")
    bigO.write.mode("overwrite").parquet("/tmp/big_o")
    val LI = spark.read.parquet("/tmp/big_li")
    val O = spark.read.parquet("/tmp/big_o")
    println(s"ROWS lineitem=${LI.count()} orders=${O.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCALEREL $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("q01_shape_agg") {
      LI.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1))).count()
    }
    time("join_agg") {
      O.join(LI, O("o_orderkey") === LI("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1))).count()
    }
    time("latest_per_key_window") {
      graft.operators.Relational.latestPerKey(O, Seq("o_custkey"),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc)).count()
    }
    time("upsert_merge") {
      graft.operators.Relational.lastWins(
        O, O.limit(500000).withColumn("o_totalprice", col("o_totalprice") + 1),
        Seq("o_orderkey"), lit(0)).count()
    }
    spark.stop()
  }
}
