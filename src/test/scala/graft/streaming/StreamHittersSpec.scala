package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Streaming Misra-Gries: MG guarantees end-to-end through
  * mapGroupsWithState, state accumulation across triggers, bounded
  * state size. */
class StreamHittersSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  // skewed stream: "hot" = 40% of 1000 items, "warm" = 10%, long tail
  private val batch1: Seq[String] =
    (1 to 400).map(_ => "hot") ++ (1 to 100).map(_ => "warm") ++
      (1 to 500).map(i => s"tail$i")
  private val batch2: Seq[String] =
    (1 to 300).map(_ => "hot") ++ (1 to 200).map(_ => "warm2")

  test("streaming shard summaries: guarantees, incremental state, bounded size") {
    implicit val s = spark
    import s.implicits._
    val k = 8
    val nShards = 4
    val dir = java.nio.file.Files.createTempDirectory("graft_shitters").toString

    batch1.toDF("value").coalesce(1).write.mode("overwrite").parquet(s"$dir/data")
    batch2.toDF("value").coalesce(1).write.mode("append").parquet(s"$dir/data")
    val stream = spark.readStream.schema("value STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/data")
      .as[String]

    val q = StreamHitters.shardSummaries(stream, nShards, k)
      .writeStream.outputMode("update").format("memory")
      .queryName("shitters_out").start()
    q.processAllAvailable()
    q.stop()

    // take each shard's LATEST summary (largest n_seen)
    val rows = spark.table("shitters_out")
      .as[StreamHitters.ShardSummary].collect()
    val latest = rows.groupBy(_.shard).values.map(_.maxBy(_.n_seen)).toSeq
    val (counters, n) = StreamHitters.merged(latest, k)

    assert(n === (batch1.length + batch2.length))
    assert(counters.size <= k)
    // per-shard MG guarantee: items heavier than n_shard/(k+1) survive
    assert(counters.contains("hot"), s"hot missing from $counters")
    assert(counters.contains("warm2"), s"warm2 missing from $counters")
    // undercount bound: count within n_shard/(k+1) of truth
    val hotShardN = latest.find(_.shard ==
      StreamHitters.shardOf("hot", nShards)).get.n_seen
    assert(counters("hot") <= 700L)
    assert(counters("hot") >= 700L - hotShardN / (k + 1))
    // state bounded: every emitted summary respects the cap
    assert(rows.forall(_.counters.size <= k))
  }

  test("merged summaries preserve the MG merge semantics of the batch aggregator") {
    // shard summaries merged == capped counter sums (order-free check
    // against a direct fold)
    val a = StreamHitters.ShardSummary(0, Map("x" -> 10L, "y" -> 3L), 13L)
    val b = StreamHitters.ShardSummary(1, Map("x" -> 5L, "z" -> 7L), 12L)
    val (m, n) = StreamHitters.merged(Seq(a, b), k = 2)
    assert(n === 25L)
    // sums: x=15, y=3, z=7 → cap to 2: cut = 3 → x=12, z=4
    assert(m === Map("x" -> 12L, "z" -> 4L))
  }
}
