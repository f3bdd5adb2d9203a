package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset mixture weighting — materialize a training mix where each
  * stratum (source/domain) is seen `weight` epochs: weight 2.5 means
  * every row appears in 2 full epochs plus a 50% partial epoch. This is
  * how LLM corpora up-/down-sample domains (wiki at 3 epochs, common
  * crawl at 0.5, …) — and at 100 TB the partial epoch must be an EXACT,
  * reproducible subset, not a Bernoulli draw whose size wobbles and
  * whose membership changes with the cluster layout.
  *
  *  - full epochs: a generator (`explode(sequence(...))`) — narrow, no
  *    shuffle, output volume = Σ n_s·floor(w_s) by construction;
  *  - the partial epoch: exactly `ceil(frac_s · n_s)` rows per stratum,
  *    chosen by the same stable key-hash rank as
  *    [[Sampling.stratifiedExact]] (one window pass over only the
  *    strata with a fractional part);
  *  - rows with NULL or non-positive weight drop out (weight 0 = not in
  *    the mix).
  *
  * Output = input columns + `epoch` (0-based). Downstream packing/
  * shuffling treats (key, epoch) as the replica identity.
  *
  * `weight` must be constant within each stratum (it's read per-row;
  * mixed weights inside one stratum make the partial-epoch count
  * ill-defined — caller contract, as with every weights table). */
object Mixture {

  def materialize(df: DataFrame, strata: Seq[String], key: Column,
                  weight: Column, seed: Long = 42L): DataFrame = {
    require(strata.nonEmpty, "need at least one stratum column")
    for (c <- Seq("__w", "__frac", "__rn", "__n", "epoch"))
      require(!df.columns.contains(c), s"input already has a $c column")
    val outCols = df.columns.toSeq

    val w = df.withColumn("__w", weight.cast("double"))
    val full = w.filter(col("__w") >= 1.0)
      .select(outCols.map(col) :+
        explode(sequence(lit(0L), floor(col("__w")).cast("long") - 1))
          .as("epoch"): _*)

    // __w > 0 guard: a NEGATIVE non-integer weight still has a positive
    // fractional part (floor rounds down), and must drop out, not emit
    // epoch -1 rows
    val frac = w.withColumn("__frac", col("__w") - floor(col("__w")))
      .filter(col("__w") > 0 && col("__frac") > 0)
    val rankW = Window.partitionBy(strata.map(col): _*)
      .orderBy(Sampling.hashBucket(key, seed).asc, key.asc)
    val nW = Window.partitionBy(strata.map(col): _*)
    val partial = frac
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(nW))
      .filter(col("__rn") <= ceil(col("__n") * col("__frac")))
      .select(outCols.map(col) :+
        floor(col("__w")).cast("long").as("epoch"): _*)

    full.unionByName(partial)
  }

  /** Deterministic weighted INTERLEAVING — the data ORDER for a mixed
    * training run: given integer rates per source, emit a single
    * global sequence where any prefix contains each source in
    * proportion to its weight (weighted fair queuing / smooth weighted
    * round-robin). Each source's i-th row gets virtual time
    * `(2i−1)·(L/w)` (L = lcm of weights — odd multiples center the
    * samples, the classic WFQ finish-time trick), and the global
    * position is the rank of (vtime, source, key) — all exact
    * integers, so the schedule is reproducible on any engine/layout.
    *
    * Shape: one per-source rank window (hash by source — per-source
    * sorts scale out), then [[Relational.globalRank]] (range exchange,
    * no single-partition sort). Rows whose source has no weight drop
    * out. Appends `vtime` and `pos`. */
  def interleave(df: DataFrame, sourceCol: Column, key: Column,
                 weights: Map[String, Int]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 1),
      "weights must be positive integers")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcm = weights.values.map(_.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val strides = weights.map { case (s, w) => s -> (lcm / w) }
    val strideCol = element_at(
      typedLit(strides), sourceCol.cast("string"))
    val rw = Window.partitionBy(sourceCol).orderBy(key.asc)
    val timed = df
      .withColumn("__stride", strideCol)
      .filter(col("__stride").isNotNull)
      .withColumn("vtime",
        (row_number().over(rw).cast("long") * 2L - 1L) * col("__stride"))
      .drop("__stride")
    Relational.globalRank(timed, Seq(col("vtime"), sourceCol, key))
      .withColumnRenamed("rank", "pos")
  }

  /** Square-root temperature sampling shares (τ = 1/2) — the standard
    * multilingual/multi-source rebalancing (mC4, XLM-R shape): sampling
    * a source ∝ √(its size) upweights the tail without letting the head
    * dominate. τ = 1/2 is the one temperature with an ENGINE-EXACT
    * evaluation: s_i = ⌊√(n_i · 10⁶)⌋ is the floor of one
    * correctly-rounded IEEE sqrt (bit-identical on any engine — the
    * cast and the sqrt round identically everywhere; within 1 ulp of
    * the true integer sqrt, same everywhere), and the shares are
    * integer ratios of those: share_ppm_i = (10⁶·s_i) DIV Σ s_j.
    * `raw_share_ppm` (∝ n_i) rides along so the flattening is visible;
    * feed the shares to [[interleave]] / `Sampling.budgetCap` to
    * realize the mixture.
    *
    * One map-side-combined count per source + a one-row broadcast
    * total — O(#sources) everything. Output: (`source`, `n_rows`,
    * `sqrt_milli`, `raw_share_ppm`, `share_ppm`). */
  def sqrtTemperatureShares(df: DataFrame, sourceCol: Column): DataFrame = {
    val counts = df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("sqrt_milli",
        floor(sqrt((col("n_rows") * lit(1000000L)).cast("double")))
          .cast("long"))
    val totals = broadcast(counts.agg(
      sum(col("n_rows")).as("__tn"), sum(col("sqrt_milli")).as("__ts")))
    counts.crossJoin(totals)
      .select(col("source"), col("n_rows"), col("sqrt_milli"),
        expr("(1000000L * n_rows) DIV __tn").as("raw_share_ppm"),
        expr("(1000000L * sqrt_milli) DIV __ts").as("share_ppm"))
  }

  /** Largest-remainder (Hamilton) apportionment: turn mixture weights
    * into EXACT integer document budgets that sum to precisely
    * `budget` — the missing last step between a share table
    * ([[sqrtTemperatureShares]], a hand-tuned mixture) and the samplers
    * that realize it (`Sampling.budgetCap`, `bottomKPerStratum` take
    * integer quotas). Naive per-stratum rounding drifts by up to
    * #strata rows; Hamilton is the canonical fix and is fully
    * integer-deterministic:
    *
    *   quota_g  = budget · w_g / Σw      (exactly, as a rational)
    *   base_g   = (budget · w_g) DIV Σw  (truncated)
    *   leftover = budget − Σ base_g      (< #strata, ≥ 0)
    *   +1 to the `leftover` strata with the largest remainders
    *     rem_g = (budget · w_g) mod Σw, ties → stratum name ASC
    *
    * Every step is integer arithmetic over DECIMAL(38,0)-widened
    * products plus one ranking window over the STRATA-sized frame (the
    * bounded exception — shares live there too). Zero/negative weights
    * allocate 0 (never filtered from the output — the caller sees every
    * stratum). Output: `stratum`, `weight` LONG, `base` LONG,
    * `remainder` LONG (the mod — audit surface), `extra` 0/1,
    * `alloc` LONG with Σ alloc = budget whenever Σw > 0 (an all-zero
    * weight table allocates nothing — there is no sane way to split a
    * budget over zero total weight); total order by stratum. */
  def apportion(weights: DataFrame, stratum: Column, weight: Column,
                budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val base = weights
      .select(stratum.cast("string").as("stratum"),
        weight.cast("long").as("weight"))
      .groupBy(col("stratum"))
      .agg(sum(greatest(col("weight"), lit(0L))).as("weight"))
    val tot = broadcast(base.agg(
      sum(col("weight")).as("__tw"),
      count(lit(1)).as("__ns")))
    val quotas = base.crossJoin(tot)
      .select(col("stratum"), col("weight"),
        expr(s"CASE WHEN __tw > 0 THEN (CAST(weight AS DECIMAL(38,0)) * ${budget}L) div __tw ELSE 0 END")
          .as("base"),
        expr(s"CASE WHEN __tw > 0 THEN CAST(pmod(CAST(weight AS DECIMAL(38,0)) * ${budget}L, __tw) AS BIGINT) ELSE 0 END")
          .as("remainder"))
    val leftovers = broadcast(quotas.agg(
      (lit(budget) - coalesce(sum(col("base")), lit(0L))).as("__left")))
    // remainder ranking over the strata-sized frame; ties broken by name
    val w = BoundedWindow.ordered(col("stratum"), col("remainder").desc, col("stratum").asc)
    quotas.crossJoin(leftovers)
      .withColumn("extra",
        when(row_number().over(w) <= col("__left") && col("remainder") > 0, 1L)
          .otherwise(0L))
      .select(col("stratum"), col("weight"), col("base"), col("remainder"),
        col("extra"), (col("base") + col("extra")).as("alloc"))
      .orderBy("stratum")
  }
}
