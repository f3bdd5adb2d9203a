package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.operators.HeavyHitters

/** STREAMING heavy hitters — the unbounded-stream face of q71's
  * mergeable Misra-Gries: who is hot on the event stream RIGHT NOW,
  * without ever holding per-item counts for an unbounded item space.
  *
  * Shape: items hash to `nShards` shards; each shard's group keeps ONE
  * bounded MG summary (≤ k counters + a seen-count) in
  * `mapGroupsWithState` and re-emits it every trigger. State is
  * O(nShards · k) TOTAL — independent of stream length and item
  * cardinality, the whole point. Downstream, [[merged]] folds the shard
  * summaries with the SAME capped merge the batch aggregator uses
  * (`HeavyHitters.mergeCounters`), so the classic MG contract survives
  * end-to-end: any item with true count > n/(k+1) per shard is present,
  * counts undercount by at most n_shard/(k+1), and false heavies are
  * eliminated by an exact count-check over the ≤ nShards·k candidates
  * (the batch refinement `HeavyHitters.exactHeavyHitters` runs on any
  * stored slice).
  *
  * `nShards` is the parallelism lever: shard-local state updates scale
  * out across executors, and summaries are trigger-granular (update
  * output mode — each trigger re-emits the shards that changed).
  */
object StreamHitters {

  final case class ShardSummary(shard: Int, counters: Map[String, Long],
                                n_seen: Long)

  /** Deterministic shard of an item (String.hashCode is part of the
    * JLS — stable across JVMs and engines that implement it). */
  def shardOf(item: String, nShards: Int): Int =
    math.floorMod(item.hashCode, nShards)

  /** Per-shard MG summaries over a (possibly streaming) item dataset.
    * Use `.writeStream.outputMode("update")` downstream; each trigger
    * emits the new summary of every shard that saw data. */
  def shardSummaries(items: Dataset[String], nShards: Int, k: Int)
                    (implicit spark: SparkSession): Dataset[ShardSummary] = {
    import spark.implicits._
    require(nShards >= 1 && k >= 1, s"need nShards, k >= 1; got ($nShards, $k)")
    items
      .groupByKey(item => shardOf(item, nShards))
      .mapGroupsWithState[ShardSummary, ShardSummary](
        GroupStateTimeout.NoTimeout) {
        case (shard: Int, it: Iterator[String],
              state: GroupState[ShardSummary]) =>
          var counters = state.getOption.map(_.counters).getOrElse(Map.empty[String, Long])
          var n = state.getOption.map(_.n_seen).getOrElse(0L)
          it.foreach { item =>
            counters = HeavyHitters.capCounters(
              counters.updated(item, counters.getOrElse(item, 0L) + 1L), k)
            n += 1L
          }
          val out = ShardSummary(shard, counters, n)
          state.update(out)
          out
      }
  }

  /** Fold shard summaries into one global candidate summary (batch side
    * — e.g. over the memory/Delta sink the stream writes, keeping each
    * shard's LATEST row). ≤ nShards·k counters in, ≤ k out. */
  def merged(summaries: Seq[ShardSummary], k: Int): (Map[String, Long], Long) =
    (summaries.map(_.counters)
      .foldLeft(Map.empty[String, Long])(HeavyHitters.mergeCounters(_, _, k)),
      summaries.map(_.n_seen).sum)
}
