package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining: which items appear together in
  * the same basket, with support counts and lift. The classic
  * association-rule primitive (Agrawal et al., SIGMOD'93 shape) reduced
  * to its distributed core: presence-distinct → basket-keyed self-join →
  * pair aggregation.
  *
  * Analytics use: "parts bought together" over orders (the reference's
  * dashboard tier asks exactly this class of question of Postgres);
  * pipeline use: tag/source co-occurrence over documents.
  *
  * Scale posture (100 TB of baskets):
  *  - the self-join is keyed on the BASKET id, so candidate fan-out is
  *    Σ b² over per-basket item counts b — bounded by basket size (TPC-H
  *    orders: ≤7 lines), never corpus²; a mega-basket guard belongs in
  *    front if baskets are unbounded (same pattern as
  *    [[TextDedup]]'s LSH mega-bucket guard);
  *  - presence-dedup happens BEFORE the join (one (basket, item)
  *    distinct with map-side combine), so multiplicity inside a basket
  *    neither inflates counts nor the join;
  *  - item marginals are a vocabulary-sized frame; AQE broadcasts them
  *    onto the pair aggregate;
  *  - `lift` is emitted as ONE IEEE division of two exactly-representable
  *    integer products (plus both raw integers), so results are
  *    bit-identical on any engine/layout. Counts are kept in LONG —
  *    exact up to 2^63 pairs; the doubles stay exact while the products
  *    are < 2^53, and the integer columns are the audit surface beyond.
  */
object Assoc {

  /** Pairwise item co-occurrence across baskets.
    *
    * Output: `item_a` < `item_b` (each pair once), `n_both` LONG (baskets
    * containing both), `n_a`/`n_b` LONG (per-item basket counts),
    * `n_baskets` LONG, `lift` DOUBLE = n_both·N / (n_a·n_b) — >1 means
    * the items co-occur more than independence predicts. Pairs with
    * `n_both < minPairCount` are pruned (Zipf tail; prune AFTER
    * aggregation so counts stay exact). Total order (item_a, item_b).
    */
  def pairCounts(df: DataFrame, basket: Column, item: Column,
                 minPairCount: Long = 2L): DataFrame = {
    // presence, not multiplicity: one row per (basket, item)
    val present = df.select(basket.as("__b"), item.cast("string").as("__i"))
      .filter(col("__i").isNotNull)
      .distinct()

    val nBaskets = present.select(col("__b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val marginals = present.groupBy(col("__i")).agg(count(lit(1)).as("__n"))

    val a = present.select(col("__b"), col("__i").as("item_a"))
    val b = present.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, "__b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairCount)

    pairs
      .join(marginals.select(col("__i").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(marginals.select(col("__i").as("item_b"), col("__n").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_both"), col("n_a"), col("n_b"),
        col("n_baskets"),
        (col("n_both").cast("double") * col("n_baskets").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy("item_a", "item_b")
  }

  /** Three-way co-occurrence: baskets containing all of {a, b, c} — the
    * next rung of the Agrawal itemset ladder after [[pairCounts]].
    * Candidate fan-out is Σ C(b,3) over basket sizes (bounded by basket
    * width, never corpus³); presence-dedup happens before any join, and
    * the two basket-keyed self-joins keep the enumeration ordered
    * (a < b < c — each triple once).
    *
    * Output: `item_a` < `item_b` < `item_c`, `n_all` LONG (baskets with
    * all three), pruned below `minCount` AFTER aggregation; total order
    * (item_a, item_b, item_c).
    */
  def tripleCounts(df: DataFrame, basket: Column, item: Column,
                   minCount: Long = 2L): DataFrame = {
    val present = df.select(basket.as("__b"), item.cast("string").as("__i"))
      .filter(col("__i").isNotNull)
      .distinct()
    val a = present.select(col("__b"), col("__i").as("item_a"))
    val b = present.select(col("__b"), col("__i").as("item_b"))
    val c = present.select(col("__b"), col("__i").as("item_c"))
    a.join(b, "__b").filter(col("item_a") < col("item_b"))
      .join(c, "__b").filter(col("item_b") < col("item_c"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("n_all"))
      .filter(col("n_all") >= minCount)
      .orderBy("item_a", "item_b", "item_c")
  }

  /** Per-item top-k partners by lift from a [[pairCounts]] frame — the
    * "customers also bought" readout. Expands each unordered pair into
    * both directions, then a per-item rank window that plans to
    * WindowGroupLimit under the rank ≤ k filter (pairs frame is
    * vocabulary²-bounded, so this never touches basket data).
    *
    * Lift ties break on partner name — and since lift is derived from
    * exactly-representable integers (see [[pairCounts]]), the ordering
    * is engine-exact. Output: `item`, `partner`, `n_both` LONG, `lift`
    * DOUBLE, `rank` LONG, total order (item, rank).
    */
  def topPartners(pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val sym = pairs
      .select(col("item_a").as("item"), col("item_b").as("partner"),
        col("n_both"), col("lift"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("partner"), col("n_both"), col("lift")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("lift").desc, col("partner"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("item", "rank")
  }
}
