package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window sequence packing — assign documents to fixed
  * token-budget bins, the step that turns a deduplicated corpus into
  * the dense training sequences an LLM actually consumes (unpacked
  * batches waste the budget's tail as padding).
  *
  * [[packGreedy]] is the deterministic streaming form: within each
  * group (shard/source), documents are visited in `id` order and appended
  * to the current bin until the next one would overflow `budget`, which
  * starts a new bin. A document larger than the whole budget gets a bin
  * of its own (callers usually chunk those first — see `Text.chunks`).
  *
  * Scale shape: one hash exchange on `group` + one in-partition sort,
  * then a single forward pass per group (`mapPartitions`, O(1) state —
  * three longs). Groups are the parallelism unit: pack per shard/source
  * (plenty of groups), never globally — a single global sequence would
  * serialize the pass AND make the result depend on a total order no
  * distributed writer preserves anyway. Bin ids are unique per
  * (group, bin_seq), so downstream writers partition by group safely.
  *
  * Determinism: (group, order) totally orders each group's documents,
  * so the same corpus packs identically on any cluster layout — the
  * property that makes training-data builds reproducible.
  */
object Packing {

  /** Returns (group, id, size, bin_seq, bin_offset): `bin_seq` counts
    * bins within the group from 0; `bin_offset` is the document's start
    * position inside its bin. `size` rows must be non-negative. */
  def packGreedy(df: DataFrame, group: Column, id: Column, size: Column,
                 budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val slim = df.select(
      group.cast("string").as("group"),
      id.cast("long").as("id"),
      size.cast("long").as("size"))
    // co-locate each group, order the stream the pass consumes
    val arranged = slim
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("id"))
      .as[(String, Long, Long)]
    arranged.mapPartitions { it =>
      var curGroup: String = null
      var bin = 0L
      var used = 0L
      it.map { case (g, i, sz) =>
        if (g != curGroup) { curGroup = g; bin = 0L; used = 0L }
        val fits = used > 0L && used + sz <= budget
        if (!fits && used > 0L) { bin += 1L; used = 0L }
        val off = used
        used += sz
        (g, i, sz, bin, off)
      }
    }.toDF("group", "id", "size", "bin_seq", "bin_offset")
  }

  /** Packing efficiency report per group: bins used, mean fill ratio,
    * and the padding a naive one-doc-per-window layout would have
    * wasted instead. */
  def packingStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("group", "bin_seq")
      .agg(sum(col("size")).as("__fill"), count(lit(1)).as("__docs"))
      .groupBy("group")
      .agg(
        count(lit(1)).as("n_bins"),
        sum(col("__docs")).as("n_docs"),
        avg(least(col("__fill"), lit(budget)).cast("double") / budget)
          .as("mean_fill_ratio"))
      .orderBy("group")
}
