package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the label-quality gate in front of any
  * human- or LLM-labeled training set (reference analogue: the manual
  * spot-checks behind `dags/etl.py`'s curated city list; here the
  * general operator a labeling pipeline needs).
  *
  * Engine-exact discipline: counts stay LONG, chance-agreement products
  * widen to DECIMAL(38,0) internally and PUBLISH as BIGINT audit columns
  * (the q153 lesson: cross-engine DECIMAL output is hash-unsafe), and
  * each κ is ONE IEEE division of exact integers — bit-identical in any
  * engine and under any row layout. κ is SIGNED (worse-than-chance
  * agreement is negative), which is exactly why it is published as that
  * single division rather than an integer ppm: Spark's DIV truncates
  * toward zero while DuckDB's // floors, so a signed integer quotient
  * would silently diverge cross-engine.
  */
object Agreement {

  /** Cohen's κ between two raters over the same items.
    *
    * κ = (p_o − p_e) / (1 − p_e) with observed agreement p_o = agree/n
    * and chance agreement p_e = Σ_c a_c·b_c / n² (a_c, b_c the raters'
    * marginal counts). Cleared of denominators:
    *
    *   κ = (agree·n − pe_num) / (n² − pe_num),  pe_num = Σ_c a_c·b_c
    *
    * — both sides exact integers (DECIMAL(38,0)-widened; n² passes 2^63
    * past ~3e9 items), κ one IEEE division, NULL when n² = pe_num (a
    * constant rater — chance explains everything; never a fake 0).
    *
    * Scale posture: ONE (r1, r2) cells aggregate (map-side combined)
    * collapses the corpus to ≤ |categories|² rows; marginals and the
    * Σ a_c·b_c product come from category-sized aggregates + one tiny
    * inner join on category (absent categories contribute 0 products by
    * construction). Rows with a NULL rating on either side are
    * quarantined in `n_null`, never silently dropped.
    *
    * Output (one row): `n`, `n_null`, `n_agree`, `pe_num` LONG,
    * `kappa` DOUBLE-or-NULL.
    */
  def cohenKappa(df: DataFrame, r1: Column, r2: Column): DataFrame = {
    val base = df.select(r1.cast("string").as("__a"),
      r2.cast("string").as("__b"))
    val nNull = base.agg(coalesce(sum(when(col("__a").isNull ||
      col("__b").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    val cells = base
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val totals = cells.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))
        .otherwise(0L)), lit(0L)).as("n_agree"))
    val aTot = cells.groupBy(col("__a").as("__c"))
      .agg(sum(col("__n")).as("__ra"))
    val bTot = cells.groupBy(col("__b").as("__c"))
      .agg(sum(col("__n")).as("__cb"))
    val pe = aTot.join(bTot, "__c")
      .agg(coalesce(sum(col("__ra").cast("decimal(38,0)") * col("__cb")),
        lit(0L).cast("decimal(38,0)")).as("__pe"))
    totals.crossJoin(pe).crossJoin(nNull)
      .withColumn("__num",
        col("n_agree").cast("decimal(38,0)") * col("n") - col("__pe"))
      .withColumn("__den",
        col("n").cast("decimal(38,0)") * col("n") - col("__pe"))
      .withColumn("kappa",
        when(col("__den") =!= lit(0L).cast("decimal(38,0)"),
          col("__num").cast("double") / col("__den").cast("double")))
      .select(col("n"), col("n_null"), col("n_agree"),
        col("__pe").cast("long").as("pe_num"), col("kappa"))
  }

  /** Fleiss' κ over a votes table (one row per individual rating) — the
    * multi-rater generalization of [[cohenKappa]] for R ≥ 2
    * interchangeable raters.
    *
    * Requires exactly `raters` votes per item (the estimator's own
    * precondition); items with any other vote count are EXCLUDED and
    * counted in `n_dropped` — visible, never silently padded. With n_ij
    * the per-(item, category) vote counts, N kept items, R raters:
    *
    *   S1 = Σ_i Σ_j n_ij² − N·R          (per-item agreement mass)
    *   S2 = Σ_j C_j²                     (squared category column sums)
    *   κ  = (S1·N·R − S2·(R−1)) / ((N²R² − S2)·(R−1))
    *
    * — the closed integer form of (P̄ − P̄e)/(1 − P̄e) after clearing
    * denominators; DECIMAL(38,0)-widened, κ one IEEE division, NULL
    * when the denominator is 0 (no kept items, or every vote in one
    * category).
    *
    * Scale posture: one (item, rating) counts aggregate, an item-sized
    * rollup (per-item R_i and Σ n_ij²), a semi join to keep conforming
    * items, and category-sized column sums. Nothing shuffles rows wider
    * than the counts frames. NULL items/ratings quarantine in `n_null`.
    *
    * Output (one row): `n_items`, `n_dropped`, `n_null`, `s1`, `s2`
    * LONG, `kappa` DOUBLE-or-NULL.
    */
  def fleissKappa(votes: DataFrame, item: Column, rating: Column,
                  raters: Int): DataFrame = {
    require(raters >= 2, s"fleissKappa needs raters >= 2, got $raters")
    val base = votes.select(item.cast("string").as("__i"),
      rating.cast("string").as("__r"))
    val nNull = base.agg(coalesce(sum(when(col("__i").isNull ||
      col("__r").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    val nij = base
      .filter(col("__i").isNotNull && col("__r").isNotNull)
      .groupBy(col("__i"), col("__r"))
      .agg(count(lit(1)).as("__n"))
    val perItem = nij.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__ri"),
        sum(col("__n") * col("__n")).as("__sq"))
    val kept = perItem.filter(col("__ri") === raters.toLong)
    val dropped = perItem.agg(coalesce(sum(
      when(col("__ri") =!= raters.toLong, 1L).otherwise(0L)), lit(0L))
      .as("n_dropped"))
    val s1n = kept.agg(count(lit(1)).as("n_items"),
      (coalesce(sum(col("__sq")), lit(0L)) -
        count(lit(1)) * raters.toLong).as("s1"))
    val s2 = nij.join(kept.select(col("__i")), Seq("__i"), "left_semi")
      .groupBy(col("__r"))
      .agg(sum(col("__n")).as("__cj"))
      .agg(coalesce(sum(col("__cj").cast("decimal(38,0)") * col("__cj")),
        lit(0L).cast("decimal(38,0)")).as("__s2"))
    val r = lit(raters.toLong)
    s1n.crossJoin(s2).crossJoin(dropped).crossJoin(nNull)
      .withColumn("__nr2",
        col("n_items").cast("decimal(38,0)") * col("n_items") * r * r)
      .withColumn("__num",
        col("s1").cast("decimal(38,0)") * col("n_items") * r -
          col("__s2") * (r - 1L))
      .withColumn("__den", (col("__nr2") - col("__s2")) * (r - 1L))
      .withColumn("kappa",
        when(col("__den") =!= lit(0L).cast("decimal(38,0)"),
          col("__num").cast("double") / col("__den").cast("double")))
      .select(col("n_items"), col("n_dropped"), col("n_null"),
        col("s1"), col("__s2").cast("long").as("s2"), col("kappa"))
  }

  /** Majority-vote label aggregation — the consensus step that turns a
    * multi-rater votes table into one training label per item, with the
    * agreement share kept as a per-item confidence signal.
    *
    * The winning label is the max-count rating; ties break to the
    * LEXICALLY SMALLEST rating — a total order, so the pick is
    * deterministic under any layout. `agreement_ppm` is the winner's
    * truncating vote share (votes_top·10⁶ DIV votes_total — both
    * positive, so trunc ≡ floor and the quotient is engine-safe).
    *
    * Scale posture: one (item, rating) counts aggregate, then the
    * per-item winner via a rank window over the counts frame (plans to
    * WindowGroupLimit — map-side pruned) sharing the same item exchange
    * as the per-item totals. NULL items/ratings are dropped (quarantine
    * belongs to [[fleissKappa]]'s n_null).
    *
    * Output: `item`, `vote`, `n_votes`, `n_top` LONG, `agreement_ppm`
    * LONG — total order by item.
    */
  def majorityVote(votes: DataFrame, item: Column, rating: Column): DataFrame = {
    val nij = votes.select(item.cast("string").as("item"),
      rating.cast("string").as("__r"))
      .filter(col("item").isNotNull && col("__r").isNotNull)
      .groupBy(col("item"), col("__r"))
      .agg(count(lit(1)).as("__n"))
    val top = Relational.topKPerKey(nij, Seq("item"), 1,
      Seq(col("__n").desc, col("__r").asc))
    val totals = nij.groupBy(col("item"))
      .agg(sum(col("__n")).as("n_votes"))
    top.join(totals, "item")
      .select(col("item"), col("__r").as("vote"),
        col("n_votes"), col("__n").as("n_top"),
        expr("(__n * 1000000L) DIV n_votes").as("agreement_ppm"))
      .orderBy(col("item"))
  }

  /** Krippendorff's α (nominal) — the agreement coefficient for the
    * realistic labeling table [[cohenKappa]] and [[fleissKappa]] can't
    * take: raters vary per item AND per-item vote counts vary (missing
    * votes). With m_i votes on item i (d_i = ordered disagreeing pairs),
    * n = Σ m_i pairable ratings and n_c the category totals:
    *
    *   α = 1 − [(n−1)·Σ_i d_i/(m_i−1)] / (n² − Σ_c n_c²)
    *
    * The per-item 1/(m_i−1) is the one exactness hazard (a float sum
    * over items would be ORDER-DEPENDENT); it is cleared by `scaleL`, a
    * caller-chosen common multiple of every expected m_i−1 (the default
    * lcm(1..10) = 2520 covers ≤ 11 raters): each item contributes the
    * exact integer d_i·(L DIV (m_i−1)), so
    *
    *   α = (L·D_e − (n−1)·D_o_scaled) / (L·D_e)
    *
    * is ONE IEEE division over DECIMAL(38,0)-exact integers. Items whose
    * m_i−1 does NOT divide L (and single-vote items, which are
    * unpairable) are EXCLUDED and counted in `n_dropped` — the
    * [[fleissKappa]] visible-drop posture; pick L large enough that the
    * count is 0.
    *
    * Scale posture: one (item, rating) counts aggregate, an item-sized
    * rollup, category-sized totals — the corpus is touched once; no
    * driver state (L is a static literal, so any SQL engine replays the
    * whole computation). α is NULL when D_e = 0 (every kept rating in
    * one category — chance explains everything; never a fake 0).
    *
    * Output (one row): `n_items`, `n_dropped`, `n_null`, `n_ratings`,
    * `do_scaled`, `scale_l`, `de` LONG, `alpha` DOUBLE-or-NULL.
    * i64 audit bound: de = n² − Σn_c² needs n ≤ ~3e9; do_scaled needs
    * Σ d_i·L ≤ 2⁶³ — with L = 2520 that is ~10⁹ disagreeing pairs.
    */
  def krippendorffAlpha(votes: DataFrame, item: Column, rating: Column,
                        scaleL: Long = 2520L): DataFrame = {
    require(scaleL >= 1L, s"scaleL must be >= 1, got $scaleL")
    val base = votes.select(item.cast("string").as("__i"),
      rating.cast("string").as("__r"))
    val nNull = base.agg(coalesce(sum(when(col("__i").isNull ||
      col("__r").isNull, 1L).otherwise(0L)), lit(0L)).as("n_null"))
    val nij = base
      .filter(col("__i").isNotNull && col("__r").isNotNull)
      .groupBy(col("__i"), col("__r"))
      .agg(count(lit(1)).as("__n"))
    val perItem = nij.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * (col("__n") - 1L)).as("__agree"))
      .withColumn("__keep",
        col("__m") >= 2L && lit(scaleL) % (col("__m") - 1L) === 0L)
    val kept = perItem.filter(col("__keep"))
    val dropped = perItem.agg(coalesce(sum(when(!col("__keep"), 1L)
      .otherwise(0L)), lit(0L)).as("n_dropped"))
    val doN = kept.agg(count(lit(1)).as("n_items"),
      coalesce(sum(col("__m")), lit(0L)).as("n_ratings"),
      coalesce(sum((col("__m") * (col("__m") - 1L) - col("__agree"))
          .cast("decimal(38,0)") *
          expr(s"${scaleL}L DIV (__m - 1L)")),
        lit(0L).cast("decimal(38,0)")).as("__do"))
    val de = nij.join(kept.select(col("__i")), Seq("__i"), "left_semi")
      .groupBy(col("__r"))
      .agg(sum(col("__n")).as("__nc"))
      .agg(coalesce(sum(col("__nc").cast("decimal(38,0)") * col("__nc")),
        lit(0L).cast("decimal(38,0)")).as("__sumsq"))
    doN.crossJoin(de).crossJoin(dropped).crossJoin(nNull)
      .withColumn("__de",
        col("n_ratings").cast("decimal(38,0)") * col("n_ratings") -
          col("__sumsq"))
      .withColumn("__num",
        col("__de") * scaleL - (col("n_ratings") - 1L) * col("__do"))
      .withColumn("__den", col("__de") * scaleL)
      .withColumn("alpha",
        when(col("__den") > lit(0L).cast("decimal(38,0)"),
          col("__num").cast("double") / col("__den").cast("double")))
      .select(col("n_items"), col("n_dropped"), col("n_null"),
        col("n_ratings"), col("__do").cast("long").as("do_scaled"),
        lit(scaleL).as("scale_l"), col("__de").cast("long").as("de"),
        col("alpha"))
  }
}
