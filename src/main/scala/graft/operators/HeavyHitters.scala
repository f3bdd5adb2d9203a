package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters at unbounded cardinality — the two-pass
  * sketch-then-verify pattern that finds every item occurring more than
  * n/k times WITHOUT a full groupBy over the domain:
  *
  *  1. pass 1: a mergeable Misra-Gries summary (bounded at k counters
  *     per partial — O(k) memory regardless of domain size) runs as a
  *     map-side-combining UDAF and yields ≤ k CANDIDATES. The MG
  *     guarantee makes this a superset of the true heavy hitters:
  *     an item with frequency > n/k cannot be evicted from every
  *     partial (total undercount ≤ n/(k+1) < n/k).
  *  2. pass 2: exact counts for the candidates only — a scan filtered
  *     by an ≤k-item IN-list, so the aggregation state is k keys, not
  *     the domain.
  *
  * Output is EXACT (item, n_item) for every item with n_item·k > n —
  * deterministic and oracle-able, unlike sketch counts. A plain
  * `groupBy(item).count().filter(...)` computes the same answer with a
  * domain-sized shuffle; at 100 TB of tokens (billions of distinct
  * items, a handful of heavies) the two-pass form shuffles k counters
  * per partition instead.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries: at most k counters; overflow subtracts the
    * minimum count from every counter (dropping the zeros). Merging
    * sums counters then re-caps the same way — summaries stay ≤ k and
    * the undercount bound n/(k+1) survives merging. */
  /** The MG cap: at most k counters; overflow subtracts the
    * (size−k)-th smallest count from every counter, dropping zeros.
    * Shared by the batch Aggregator and the streaming per-shard state
    * ([[graft.streaming.StreamHitters]]) so both carry the identical
    * undercount bound. */
  private[graft] def capCounters(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toArray.sorted.apply(m.size - k - 1)
      m.flatMap { case (key, c) =>
        if (c - cut > 0) Some(key -> (c - cut)) else None
      }
    }

  /** Counter-map merge + re-cap — summaries stay ≤ k and the n/(k+1)
    * undercount bound survives (merge of MG summaries is MG). */
  private[graft] def mergeCounters(a: Map[String, Long], b: Map[String, Long],
                                   k: Int): Map[String, Long] =
    capCounters(b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }, k)

  class MisraGriesAgg(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1, s"k must be >= 1, got $k")

    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b else capCounters(b.updated(v, b.getOrElse(v, 0L) + 1L), k)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mergeCounters(a, b, k)
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Every item of `c` with frequency strictly greater than n/k, with
    * its EXACT count: (item, n_item), at most k rows. The threshold
    * compares as `n_item · k > n` — integer arithmetic, no division.
    * The ≤k candidate strings pass through the driver (bounded by k by
    * construction — that's the sketch's contract, not a data-size
    * risk). */
  def exactHeavyHitters(df: DataFrame, c: Column, k: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(k))
    val row = df.agg(mg(c).as("cand"), count(c).as("n")).head()
    val candidates = row.getAs[Map[String, Long]]("cand").keys.toSeq
    val n = row.getAs[Long]("n")
    if (candidates.isEmpty) {
      df.sparkSession.emptyDataFrame
        .withColumn("item", lit(null).cast("string"))
        .withColumn("n_item", lit(null).cast("long"))
        .limit(0)
    } else {
      df.filter(c.isin(candidates: _*))
        .groupBy(c.as("item"))
        .agg(count(lit(1)).as("n_item"))
        .filter(col("n_item") * k > n)
        .orderBy(col("n_item").desc, col("item").asc)
    }
  }
}
