package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, key-based sampling and splitting — the training-data
  * pipeline's reproducibility primitives.
  *
  * `df.sample()` draws per-partition randomness: results change with
  * partitioning, retries, and cluster size — unacceptable when a
  * train/val/test split must be stable across reruns and engines. These
  * operators derive membership from a HASH OF THE KEY instead:
  *
  *  - same key → same bucket, forever, on any cluster layout;
  *  - narrow (a filter over a codegen'd hash — no shuffle, no state);
  *  - splits are disjoint and exhaustive by construction;
  *  - downstream joins stay consistent: every row of an entity lands on
  *    the same side of the split when keyed by that entity's id (the
  *    standard guard against train/test leakage).
  */
object Sampling {

  private val Buckets = 1000000L // ppm resolution for fractions

  /** Stable bucket in [0, 1000000) for a key. `xxhash64` has no seed
    * parameter, so the seed participates as a hashed leading column —
    * different seeds give independent assignments over the same keys.
    *
    * Null keys: `xxhash64` SKIPS null inputs, so a raw
    * `xxhash64(seed, key)` would hash a null key as if the column were
    * absent — colliding with `xxhash64(seed)` and, for multi-column
    * composites, making (null, x) collide with (x, null). Nulls
    * therefore hash through an explicit sentinel: they still land in
    * ONE bucket (equal keys must co-locate, and null is one key — the
    * correct key-split semantics), but that bucket is a deliberate,
    * collision-free value, not the hash-of-nothing accident. A
    * null-heavy column still makes per-row split fractions lumpy: all
    * nulls land in the same split. Pre-coalesce to a row-unique
    * surrogate (e.g. `coalesce(key, concat(lit("\\u0000"), rowIdCol))`)
    * if nulls should be spread. */
  def hashBucket(key: Column, seed: Long = 42L): Column =
    pmod(when(key.isNull,
        xxhash64(lit(seed), lit("\u0000graft:null-key\u0000")))
      .otherwise(xxhash64(lit(seed), key)), lit(Buckets))

  /** Deterministic sample of ~`fraction` of rows, keyed by `key`. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
                  seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0, 1]")
    df.filter(hashBucket(key, seed) < (fraction * Buckets).toLong)
  }

  /** Split-name column for weighted, disjoint, exhaustive splits — e.g.
    * `assignSplit(col("doc_id"), Seq(0.8, 0.1, 0.1), Seq("train", "val",
    * "test"))`. Weights are normalized; boundaries are cumulative ppm
    * thresholds over the key hash, so every key falls in exactly one
    * split and the assignment never changes between runs. */
  def assignSplit(key: Column, weights: Seq[Double], names: Seq[String],
                  seed: Long = 42L): Column = {
    require(weights.nonEmpty && weights.length == names.length,
      "weights and names must align")
    require(weights.forall(_ > 0), "weights must be positive")
    require(names.distinct.length == names.length,
      s"split names must be distinct, got $names") // dup names would break disjointness
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(w => (w / total * Buckets).toLong)
    val b = hashBucket(key, seed)
    // last split takes everything below Buckets (guards rounding)
    val first = when(b < cum.head, lit(names.head))
    names.zip(cum).drop(1).dropRight(1).foldLeft(first) {
      case (acc, (name, bound)) => acc.when(b < bound, lit(name))
    }.otherwise(lit(names.last))
  }

  /** Materialized splits in `names` order. The tag column name is
    * collision-checked so a user column is never silently overwritten. */
  def splitByKey(df: DataFrame, key: Column, weights: Seq[Double],
                 names: Seq[String], seed: Long = 42L): Seq[DataFrame] = {
    val tag = "__graft_split_tag"
    require(!df.columns.contains(tag), s"input already has a $tag column")
    val tagged = df.withColumn(tag, assignSplit(key, weights, names, seed))
    names.map(n => tagged.filter(col(tag) === n).drop(tag))
  }

  /** Leakage-free split: every row of a `group` (exact-dup digest
    * cluster, near-dup component, site, author) lands in the SAME split,
    * because assignment hashes the group's canonical representative —
    * its MIN member id — instead of the row. THE splitting discipline a
    * training corpus needs: a per-row hash split puts two near-identical
    * documents on opposite sides of the train/test fence and the
    * held-out metric silently measures memorization, not generalization.
    * Compose the group from [[graft.operators.TextDedup]] clusters /
    * [[graft.operators.Graph.connectedComponentsStar]] components for
    * near-dup safety, or any entity key (author, domain) for
    * entity-level holdout.
    *
    * Rows with a NULL group are their OWN singleton groups, keyed by
    * the row id — null means "no known cluster", and gluing all unknown
    * rows into one mega-group would ship an arbitrary corpus slice into
    * a single split (the [[hashBucket]] null-sentinel note, taken one
    * step further).
    *
    * Shape: one (group)-keyed min-aggregate over the non-null groups +
    * one join-back on the group key, then [[assignSplit]]'s pure
    * projection — two bounded key shuffles, no window, no driver state.
    * Appends a `split` column (collision-checked). Deterministic across
    * runs, engines, and layouts for a fixed seed. */
  def groupAwareSplit(df: DataFrame, group: Column, id: Column,
                      weights: Seq[Double], names: Seq[String],
                      seed: Long = 42L): DataFrame = {
    val tag = "split"
    require(!df.columns.contains(tag), s"input already has a '$tag' column")
    val withG = df
      .withColumn("__gas_g", group.cast("string"))
      .withColumn("__gas_id", id.cast("string"))
    val reps = withG.filter(col("__gas_g").isNotNull)
      .groupBy(col("__gas_g")).agg(min(col("__gas_id")).as("__gas_rep"))
    withG.join(reps, Seq("__gas_g"), "left")
      .withColumn(tag, assignSplit(
        coalesce(col("__gas_rep"), col("__gas_id")), weights, names, seed))
      .drop("__gas_g", "__gas_rep", "__gas_id")
  }

  /** EXACT stratified sample: exactly `ceil(fraction · n_g)` rows from
    * every stratum `g` (so no stratum is ever over- or under-drawn, which
    * `df.stat.sampleBy`'s per-row Bernoulli draw cannot promise), chosen
    * by ranking each stratum on a stable key hash — deterministic across
    * runs, retries, and partitionings, like everything else in this file.
    *
    * One shuffle: a single window (partition by strata, order by key
    * hash) computes both the rank and the stratum size. At 100 TB the
    * sort is per-stratum, and the selection predicate drops (1-fraction)
    * of rows immediately after the window — nothing else moves.
    *
    * `key` must be row-unique for a total order (ties broken by the key
    * value itself, so even colliding hashes stay deterministic). */
  def stratifiedExact(df: DataFrame, strata: Seq[String], key: Column,
                      fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction in [0, 1]")
    require(strata.nonEmpty, "need at least one stratum column")
    val rnCol = "__graft_rn"
    val nCol = "__graft_n"
    require(!df.columns.contains(rnCol) && !df.columns.contains(nCol),
      s"input already has a $rnCol/$nCol column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
      .orderBy(hashBucket(key, seed).asc, key.asc)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*)
    df.withColumn(rnCol, row_number().over(w))
      .withColumn(nCol, count(lit(1)).over(wAll))
      .filter(col(rnCol) <= ceil(col(nCol) * fraction))
      .drop(rnCol, nCol)
  }

  /** Deterministic NEGATIVE sampling — the contrastive/recommender
    * training staple: for every user in `positives`, emit up to `k`
    * items the user did NOT interact with. Candidates come from a
    * Lehmer-style LCG over (user, j) — pure 64-bit-safe integer
    * arithmetic (operands stay < 2^45, so engines that ERROR on BIGINT
    * overflow replay it too, unlike a native xxhash):
    *
    *   cand(user, j) = ((user % P) · 48271 + j · 16807) % P % nItems + 1
    *
    * with P = 2147483647 (the classic MINSTD modulus) and items assumed
    * dense in [1, nItems] (the usual contiguous item index; map ids
    * first otherwise). Per user, `m` candidates are drawn, first-seen
    * duplicates collapse (min j wins), true positives drop via an
    * anti-join on (user, item), and the k lowest-j survivors win —
    * every step deterministic, so the sample is REPRODUCIBLE across
    * engines, reruns, and cluster layouts, and auditable row by row.
    *
    * Scale shape: a narrow m-way generator (no shuffle), one
    * (user, item) aggregate, one anti-join against the positive set
    * (both hash-keyed), one per-user top-k window (WindowGroupLimit —
    * bounded by m candidates per user). Pick m a few× k so rejection
    * (collisions + accidental positives) rarely starves a user; heavy
    * users with > m−k positives among candidates get fewer than k
    * negatives (visible, not silently padded). Output: (user, item,
    * draw) where draw is the 1-based rank among the user's negatives. */
  def negativeSample(positives: DataFrame, user: Column, item: Column,
                     nItems: Long, k: Int, m: Int): DataFrame = {
    require(nItems >= 1, s"nItems must be >= 1, got $nItems")
    require(k >= 1 && m >= k, s"need m >= k >= 1, got k=$k m=$m")
    val P = 2147483647L
    val pos = positives.select(user.cast("long").as("user"),
      item.cast("long").as("item")).distinct()
    val cands = pos.select(col("user")).distinct()
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("item",
        (((col("user") % P) * 48271L + col("j") * 16807L) % P) % nItems + 1L)
    val firstSeen = cands.groupBy(col("user"), col("item"))
      .agg(min(col("j")).as("j"))
    val negatives = firstSeen.join(pos, Seq("user", "item"), "left_anti")
    Relational.topKPerKey(negatives, Seq("user"), k, Seq(col("j").asc))
      .select(col("user"), col("item"), col("pos").as("draw"))
  }

  /** Deterministic bottom-k sample per stratum — the streaming-friendly
    * twin of a per-stratum reservoir: keep the k rows whose
    * `md5(seed || '|' || key)` digest sorts lowest. A uniform hash makes
    * the selection a uniform k-sample, and because membership is a pure
    * function of the key, the sample is REPRODUCIBLE across engines
    * (md5 is standardized — the DuckDB oracle replays it exactly),
    * stable under re-partitioning, and MONOTONE under corpus growth:
    * adding documents can only displace the highest digests, never
    * reshuffle survivors arbitrarily — so diffing two releases' samples
    * shows real churn, not sampler noise.
    *
    * Scale shape: one window per stratum ordered by digest, planned as
    * WindowGroupLimit — the rank-≤-k cut is applied BELOW the exchange,
    * so each map task ships at most k rows per stratum; the shuffle
    * carries k·#strata rows, never the corpus. Appends `pos` (1-based
    * digest rank within the stratum).
    *
    * `key` must be row-unique (the id column); digest ties are broken
    * by the key itself so even a collision stays deterministic. */
  def bottomKPerStratum(df: DataFrame, strata: Seq[String], key: Column,
                        k: Int, seed: String = "42"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(strata.nonEmpty, "need at least one stratum column")
    val digest = md5(concat(lit(seed), lit("|"), key.cast("string")))
    Relational.topKPerKey(df.withColumn("__digest", digest), strata, k,
      Seq(col("__digest").asc, key.asc))
      .drop("__digest")
  }

  /** Deterministic global shuffle + round-robin sharding — the step
    * before a training run: a reproducible random permutation of the
    * corpus (seeded, engine-independent: md5 order, like
    * [[bottomKPerStratum]]) with balanced shard assignment
    * (|shard sizes| differ by at most 1, by construction of
    * `(pos−1) mod nShards`). Re-running with the same seed on any
    * cluster layout gives byte-identical shard manifests — what makes
    * a data order reproducible across training restarts.
    *
    * The permutation rank comes from [[Relational.globalRank]] (range
    * exchange + offset cumsum — no single-partition sort), and because
    * the sort key is a uniform digest, the range partitions are
    * balanced no matter how skewed the input layout was. Appends `pos`
    * (1-based permutation position) and `shard`. */
  def shuffleShard(df: DataFrame, key: Column, nShards: Int,
                   seed: String = "42"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val digest = md5(concat(lit(seed), lit("|"), key.cast("string")))
    Relational.globalRank(df.withColumn("__digest", digest),
        Seq(col("__digest"), key))
      .withColumnRenamed("rank", "pos")
      .withColumn("shard", ((col("pos") - 1L) % nShards).cast("int"))
      .drop("__digest")
  }

  /** Token-budget corpus selection: admit the PREFIX of a reproducible
    * shuffled order within each stratum until the stratum's token
    * budget is reached — "give me ~2B tokens per source, the same 2B
    * on every rerun". The order is the seeded md5 digest of the key
    * (uniform and engine-replayable, like [[bottomKPerStratum]]), the
    * running total is a rows-frame prefix sum, and the cut is strict
    * PREFIX semantics: the first document that would overflow the
    * budget stops admission for its stratum — later smaller documents
    * do NOT back-fill (that would make membership depend on the whole
    * tail; bin-packing admission is [[Packing.packGreedy]]'s job).
    * Consequently admitted tokens are ≤ `budget` and membership of any
    * document depends only on the documents ordered before it — stable
    * under corpus APPENDS that sort later, stable across layouts.
    *
    * Scale posture: one stratum-keyed window sort (in-partition sort
    * after one exchange — same shape as [[bottomKPerStratum]]); no
    * driver state. Output: input columns + `cum_tokens` (running total
    * INCLUDING the row) + `kept`.
    */
  def budgetCap(df: DataFrame, strata: Seq[String], key: Column,
                tokens: Column, budget: Long, seed: String = "42"): DataFrame = {
    require(strata.nonEmpty, "need at least one stratum column")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val digest = md5(concat(lit(seed), lit("|"), key.cast("string")))
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("__digest").asc, key.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__digest", digest)
      .withColumn("cum_tokens", sum(tokens.cast("long")).over(w))
      .withColumn("kept", col("cum_tokens") <= budget)
      .drop("__digest")
  }

  /** Release-shard manifest: [[shuffleShard]] composed with
    * [[CorpusStats.contentChecksum]] — one row per shard with row count
    * and order-independent content digests. This is the artifact a
    * training run verifies before reading a shard and the diff unit
    * between two releases (same shard, same digests ⇒ byte-identical
    * content, no data read). Output: (`grp` = shard, `n_rows`,
    * `n_hashed`, `sum60`, `xor60`). */
  def shardManifest(df: DataFrame, key: Column, nShards: Int,
                    value: Column, seed: String = "42"): DataFrame =
    CorpusStats.contentChecksum(
      shuffleShard(df, key, nShards, seed), col("shard"), value)

  /** Deterministic weighted sampling — priority sampling (Duffield,
    * Lund & Thorup, JACM '07): each row gets priority q = w/u with u a
    * seeded uniform, the k highest priorities per stratum are the
    * sample, and τ = the (k+1)-th priority makes
    * `w_est = max(w, τ)` an UNBIASED estimator of each sampled row's
    * weight (Σ w_est over the sample estimates the stratum's Σ w) —
    * the weighted counterpart of [[bottomKPerStratum]], and the
    * principled way to sample a mixture by token counts.
    *
    * Engine-exact determinism: u is the seeded 60-bit md5 digest of
    * the key (+1, never zero) — replayable in any engine with md5 —
    * and the priority is ONE IEEE division of those exact integers
    * (both engines correctly-round the same quotient, the repo's
    * established q153 discipline), so ordering, τ, and w_est are
    * bit-reproducible on any partitioning. Ties (identical quotient
    * bits) break on the key.
    *
    * Shape: one WindowGroupLimit pass per stratum (map tasks ship
    * ≤ k+1 rows per stratum, never the stratum) — no global sort, no
    * driver state. Rows with NULL or non-positive weight are excluded
    * (a zero-weight row can never be sampled; a NULL weight is a data
    * error surfaced by the count drop, not a silent 0).
    *
    * Output: stratum columns + (`key`, `w`, `priority` DOUBLE,
    * `rank` in 1..k, `tau` DOUBLE — 0 when the stratum has ≤ k rows
    * (then the "sample" is the stratum and w_est = w exactly),
    * `w_est` DOUBLE). */
  def prioritySample(df: DataFrame, strata: Seq[String], key: Column,
                     weight: Column, k: Int,
                     seed: String = "42"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // global sampling = one synthetic stratum (keeps the tau join and
    // the empty-(k+1) edge uniform with the per-stratum path)
    val (sdf, scols) =
      if (strata.isEmpty) (df.withColumn("__stratum", lit(0)), Seq("__stratum"))
      else (df, strata)
    val u = conv(substring(md5(concat(lit(seed), lit("|"),
      key.cast("string"))), 1, 15), 16, 10).cast("long") + 1L
    val base = sdf
      .withColumn("__w", weight.cast("long"))
      .filter(col("__w").isNotNull && col("__w") > 0L)
      .withColumn("__key", key)
      // u normalizes to (0, 1] by an EXACT power-of-two division (2^60
      // — no rounding), so priorities and τ live on the WEIGHT scale
      // (the DLT estimator max(w, τ) needs that); the only rounded op
      // is the final division — one correctly-rounded quotient on both
      // engines
      .withColumn("priority",
        col("__w").cast("double") /
          (u.cast("double") / lit(1.152921504606846976e18)))
      // project to the output surface NOW — carrying the caller's
      // columns would collide with the renamed outputs (e.g. an input
      // column already named `w`)
      .select((scols.map(col) ++
        Seq(col("__key"), col("__w"), col("priority"))): _*)
    val ranked = Relational.topKPerKey(base, scols, k + 1,
        Seq(col("priority").desc, col("__key").asc))
      .withColumnRenamed("pos", "rank")
    val tau = ranked.filter(col("rank") === k + 1)
      .groupBy(scols.map(col): _*)
      .agg(max(col("priority")).as("tau"))
    ranked.filter(col("rank") <= k)
      .join(tau, scols, "left_outer")
      .withColumn("tau", coalesce(col("tau"), lit(0.0)))
      .withColumn("w_est", greatest(col("__w").cast("double"), col("tau")))
      .withColumnRenamed("__key", "key")
      .withColumnRenamed("__w", "w")
      .select((strata.map(col) ++ Seq(col("key"), col("w"),
        col("priority"), col("rank"), col("tau"), col("w_est"))): _*)
  }

  /** Post-stratification estimator — reweight a non-representative
    * sample to known population stratum totals (the survey-sampling
    * move a labeling/eval pipeline needs when annotation effort didn't
    * follow the corpus mix):
    *
    *   post_mean = Σ_g pop_g · (Σv_g / n_g) / N_rep
    *
    * computed as nested truncating quotients of exact integers
    * ((pop_g·Σv_g·10⁶) DIV n_g, summed, DIV N_rep — positive,
    * engine-safe). N_rep is the population mass of REPRESENTED strata
    * only: unsampled population strata cannot be estimated, so they're
    * excluded and made VISIBLE via `pop_covered_ppm` (estimate scope)
    * rather than silently extrapolated; sample strata missing from the
    * population table carry NULL weights (they contribute to the naive
    * mean but not the post-stratified one).
    *
    * Scale posture: one stratum-keyed map-side-combined sample
    * aggregate, a (usually tiny) full-outer null-safe join with the
    * population frame — NULL is a real stratum on both sides — and
    * strata-sized windows for the rollups.
    *
    * Output (one row per stratum, either side): `stratum`, `n_sample`,
    * `sum_v`, `pop_n`, `mean_micro`, `weight_ppm` LONG-or-NULL, plus
    * window-total `naive_mean_micro`, `post_mean_micro`,
    * `pop_covered_ppm` — total order by stratum (NULL first).
    */
  def postStratify(sample: DataFrame, stratum: Column, value: Column,
                   pop: DataFrame): DataFrame = {
    require(pop.columns.toSeq == Seq("stratum", "pop_n"),
      s"pop frame must have columns (stratum, pop_n), got ${pop.columns.toSeq}")
    val s = sample.select(stratum.cast("string").as("__s"),
        value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n_sample"),
        coalesce(sum(col("__v")), lit(0L)).as("sum_v"))
    val p = pop.select(col("stratum").cast("string").as("__p"),
      col("pop_n").cast("long").as("pop_n"))
    val joined = s.join(p, col("__s") <=> col("__p"), "full_outer")
      .select(coalesce(col("__s"), col("__p")).as("stratum"),
        col("n_sample"), col("sum_v"), col("pop_n"))
    val wall = BoundedWindow.all(col("stratum"))
    joined
      .withColumn("__nTot",
        coalesce(sum(col("n_sample")).over(wall), lit(0L)))
      .withColumn("__vTot",
        coalesce(sum(col("sum_v")).over(wall), lit(0L)))
      .withColumn("__popTot",
        coalesce(sum(col("pop_n")).over(wall), lit(0L)))
      .withColumn("__nRep",
        coalesce(sum(when(col("n_sample") > 0L, col("pop_n"))).over(wall),
          lit(0L)))
      .withColumn("__term",
        when(col("n_sample") > 0L && col("pop_n").isNotNull, expr(
          "(CAST(pop_n AS DECIMAL(38,0)) * sum_v * 1000000) DIV n_sample")))
      .withColumn("__termSum",
        coalesce(sum(col("__term")).over(wall), lit(0L)))
      .withColumn("mean_micro",
        when(col("n_sample") > 0L,
          expr("(sum_v * 1000000L) DIV n_sample")))
      .withColumn("weight_ppm",
        when(col("n_sample") > 0L && col("pop_n").isNotNull &&
            col("__nRep") > 0L, expr(
          """(CAST(pop_n AS DECIMAL(38,0)) * __nTot * 1000000)
            | DIV (CAST(__nRep AS DECIMAL(38,0)) * n_sample)"""
            .stripMargin)))
      .withColumn("naive_mean_micro",
        when(col("__nTot") > 0L, expr("(__vTot * 1000000L) DIV __nTot")))
      .withColumn("post_mean_micro",
        when(col("__nRep") > 0L, expr("__termSum DIV __nRep")))
      .withColumn("pop_covered_ppm",
        when(col("__popTot") > 0L,
          expr("(__nRep * 1000000L) DIV __popTot")))
      .select(col("stratum"), col("n_sample"), col("sum_v"), col("pop_n"),
        col("mean_micro"), col("weight_ppm"), col("naive_mean_micro"),
        col("post_mean_micro"), col("pop_covered_ppm"))
      .orderBy(col("stratum").asc_nulls_first)
  }

  /** Poisson(1) cumulative-probability thresholds for the inverse-CDF
    * draw in [[poissonBootstrap]] — standard shortest-repr double
    * literals, so any engine parses the identical IEEE values. */
  private val PoissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Poisson bootstrap of a mean — THE bootstrap that works at corpus
    * scale: classical resampling needs n draws from a materialized
    * population (a global shuffle per replicate), while Poisson(1)
    * weights are a per-row pure function, so ALL `reps` replicates ride
    * one scan (Chamandy et al., "Estimating Uncertainty for Massive
    * Data Streams", Google 2012).
    *
    * Per (row, replicate) the weight is an inverse-CDF Poisson(1) draw
    * from the seeded md5 uniform u = (h+1)/2⁶⁰ (exact power-of-two
    * normalization — the DLT discipline above), capped at 6
    * (P(X>6) < 10⁻⁴ — deterministic, documented truncation). Replicate
    * means are truncating micro quotients of exact integer sums; the
    * across-replicate summary rides a window over the REPS-sized frame:
    *
    *   boot_var_micro2 = Σ_r (R·m_r − S)² DIV R³,   S = Σ_r m_r
    *
    * — the population variance of the replicate means cleared to
    * integers (all operands DECIMAL(38,0)-widened, numerators squares
    * so every quotient is sign-safe).
    *
    * Scale posture: ONE projection fans out ×reps (key, value, rep)
    * rows — narrow longs, map-side combined into reps-sized partial
    * aggregates; no global sort, no per-replicate scan. Degenerate
    * replicates (Σw = 0) publish NULL means and are excluded from the
    * summary via `n_ok`.
    *
    * Output (`reps` rows): `rep` INT, `n_eff`, `sum_wv` LONG,
    * `mean_micro` LONG-or-NULL, `n_ok`, `boot_mean_micro`,
    * `boot_var_micro2` LONG (summary repeated per row — the psi
    * window-total convention) — total order by rep.
    */
  def poissonBootstrap(df: DataFrame, key: Column, value: Column,
                       reps: Int, seed: String = "42"): DataFrame = {
    require(reps >= 2, s"poissonBootstrap needs reps >= 2, got $reps")
    val base = df.select(key.cast("string").as("__k"),
        value.cast("long").as("__v"))
      .filter(col("__k").isNotNull && col("__v").isNotNull)
      .select(col("__k"), col("__v"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
    val u = (conv(substring(md5(concat_ws("|", lit(seed), col("rep"),
      col("__k"))), 1, 15), 16, 10).cast("long") + 1L).cast("double") /
      1.152921504606846976e18
    val w = PoissonCdf1.zipWithIndex.foldRight(lit(6L): Column) {
      case ((c, k), rest) => when(u <= c, k.toLong).otherwise(rest)
    }
    val perRep = base.withColumn("__w", w)
      .groupBy(col("rep"))
      .agg(coalesce(sum(col("__w")), lit(0L)).as("n_eff"),
        coalesce(sum(col("__w") * col("__v")), lit(0L)).as("sum_wv"))
      .withColumn("mean_micro",
        when(col("n_eff") > 0L,
          expr("(CAST(sum_wv AS DECIMAL(38,0)) * 1000000) DIV n_eff")
            .cast("long")))
    val wall = BoundedWindow.all(col("n_eff"))
    perRep
      .withColumn("n_ok",
        coalesce(sum(when(col("mean_micro").isNotNull, 1L).otherwise(0L))
          .over(wall), lit(0L)))
      .withColumn("__s",
        coalesce(sum(col("mean_micro")).over(wall), lit(0L)))
      .withColumn("boot_mean_micro",
        when(col("n_ok") > 0L, expr("__s DIV n_ok")))
      .withColumn("__varnum",
        coalesce(sum({
          val d = col("mean_micro").cast("decimal(38,0)") * col("n_ok") -
            col("__s")
          d * d
        }).over(wall), lit(0L).cast("decimal(38,0)")))
      .withColumn("boot_var_micro2",
        when(col("n_ok") > 0L, expr(
          "__varnum DIV (CAST(n_ok AS DECIMAL(38,0)) * n_ok * n_ok)")))
      .select(col("rep"), col("n_eff"), col("sum_wv"), col("mean_micro"),
        col("n_ok"), col("boot_mean_micro"), col("boot_var_micro2"))
      .orderBy(col("rep"))
  }

  /** Randomization test for a two-group mean difference — the
    * assumption-free sibling of the z/t readout in `Analytics.abTest`:
    * under H₀ (labels exchangeable) the observed Δ should look typical
    * among Δs computed under random label reassignment, so
    *
    *   p = (1 + #{r : |Δ_r| ≥ |Δ_obs|}) / (n_valid + 1)
    *
    * (the add-one form — the observed assignment is itself one draw, so
    * p is never 0). Reassignment is the binomial(½) approximation of
    * the permutation null ([[poissonBootstrap]]'s posture: replicate
    * resampling that streams on ONE scan beats an exact shuffle that
    * needs a global sort per replicate); each (row, rep) flips on a
    * seeded md5 — deterministic, layout-independent, engine-replayable.
    *
    * Exactness: values are required NON-NEGATIVE (negative rows drop
    * visibly into `n_dropped` — a signed micro-mean would hit the
    * Spark-trunc/DuckDB-floor divergence); each Δ is the difference of
    * two positive truncating micro-quotients, so every |Δ_r| ≥ |Δ_obs|
    * compare is an exact integer predicate. Replicates where a side
    * lands empty are degenerate: excluded from `n_valid`, never counted
    * as extreme.
    *
    * Scale posture: one pass computes Δ_obs; the replicate stream is a
    * ×reps explode with a (rep)-keyed map-side-combined aggregate (reps
    * rows out); the verdict is a one-row rollup. No driver state.
    *
    * Output (one row): `n`, `n_dropped`, `n_a`, `n_b`, `t_obs_micro`,
    * `reps`, `n_valid`, `n_extreme`, `p_ppm` LONG.
    */
  def randomizationTest(df: DataFrame, id: Column, sideA: Column,
                        value: Column, reps: Int,
                        seed: String = "42"): DataFrame = {
    require(reps >= 2, s"randomizationTest needs reps >= 2, got $reps")
    val all = df.select(id.cast("string").as("__id"),
        sideA.cast("boolean").as("__a"), value.cast("long").as("__v"))
      .filter(col("__id").isNotNull && col("__a").isNotNull &&
        col("__v").isNotNull)
    val base = all.filter(col("__v") >= 0L)
    val nDropped = all.agg(coalesce(sum(when(col("__v") < 0L, 1L)
      .otherwise(0L)), lit(0L)).as("n_dropped"))
    def delta(na: String, sa: String, nb: String, sb: String): Column =
      when(col(na) > 0L && col(nb) > 0L,
        expr(s"(CAST($sa AS DECIMAL(38,0)) * 1000000) DIV $na")
          .cast("long") -
          expr(s"(CAST($sb AS DECIMAL(38,0)) * 1000000) DIV $nb")
            .cast("long"))
    val obs = base.agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("__a"), 1L).otherwise(0L)), lit(0L))
          .as("n_a"),
        coalesce(sum(when(col("__a"), col("__v")).otherwise(0L)),
          lit(0L)).as("__suma"),
        coalesce(sum(when(!col("__a"), 1L).otherwise(0L)), lit(0L))
          .as("n_b"),
        coalesce(sum(when(!col("__a"), col("__v")).otherwise(0L)),
          lit(0L)).as("__sumb"))
      .withColumn("t_obs_micro",
        delta("n_a", "__suma", "n_b", "__sumb"))
    val flips = base.select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("__fa",
        conv(substring(md5(concat_ws("|", lit(seed), col("rep"),
          col("__id"))), 1, 15), 16, 10).cast("long") % 2L === 0L)
    val perRep = flips.groupBy(col("rep"))
      .agg(
        coalesce(sum(when(col("__fa"), 1L).otherwise(0L)), lit(0L))
          .as("__na"),
        coalesce(sum(when(col("__fa"), col("__v")).otherwise(0L)),
          lit(0L)).as("__sa"),
        coalesce(sum(when(!col("__fa"), 1L).otherwise(0L)), lit(0L))
          .as("__nb"),
        coalesce(sum(when(!col("__fa"), col("__v")).otherwise(0L)),
          lit(0L)).as("__sb"))
      .withColumn("__t",
        delta("__na", "__sa", "__nb", "__sb"))
    val verdict = perRep.crossJoin(
        obs.select(col("t_obs_micro").as("__tobs")))
      .agg(
        coalesce(sum(when(col("__t").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_valid"),
        coalesce(sum(when(col("__t").isNotNull &&
            abs(col("__t")) >= abs(col("__tobs")), 1L).otherwise(0L)),
          lit(0L)).as("n_extreme"))
    obs.crossJoin(verdict).crossJoin(nDropped)
      .withColumn("reps", lit(reps.toLong))
      .withColumn("p_ppm",
        when(col("t_obs_micro").isNotNull,
          expr("((1L + n_extreme) * 1000000L) DIV (n_valid + 1L)")))
      .select(col("n"), col("n_dropped"), col("n_a"), col("n_b"),
        col("t_obs_micro"), col("reps"), col("n_valid"),
        col("n_extreme"), col("p_ppm"))
  }

  /** Effective sample size and design effect of a weighted sample —
    * the one-row verdict on whether a reweighting (post-stratification
    * q262, importance weights, dedup multiplicities) quietly destroyed
    * the sample's statistical power: Kish's
    *
    *   ESS = (Σw)² / Σw²,   deff = n·Σw² / (Σw)²  (≥ 1)
    *
    * — "your 1M reweighted rows carry the information of ESS rows".
    * Exact DECIMAL(38,0) weight moments (micro-unit weights in, so Σw²
    * is exact, never float), published as truncating positive
    * quotients. Non-positive weights drop VISIBLY (`n_dropped` — a
    * zero weight is a deletion, a negative one is a different
    * estimator). NULL results when no positive weights.
    *
    * Scale posture: ONE map-side-combined aggregate.
    *
    * Output (one row): `n`, `n_dropped`, `sum_w_micro`, `ess_micro`
    * (ESS·10⁶), `deff_ppm` LONG.
    */
  def effectiveSampleSize(df: DataFrame, weightMicro: Column): DataFrame = {
    val base = df.select(weightMicro.cast("long").as("__w"))
      .filter(col("__w").isNotNull)
    base.agg(
        coalesce(sum(when(col("__w") > 0L, 1L).otherwise(0L)), lit(0L))
          .as("n"),
        coalesce(sum(when(col("__w") <= 0L, 1L).otherwise(0L)), lit(0L))
          .as("n_dropped"),
        coalesce(sum(when(col("__w") > 0L, col("__w")).otherwise(0L)),
          lit(0L)).as("sum_w_micro"),
        coalesce(sum(when(col("__w") > 0L,
            col("__w").cast("decimal(38,0)") * col("__w"))
          .otherwise(lit(0L).cast("decimal(38,0)"))),
          lit(0L).cast("decimal(38,0)")).as("__sw2"))
      .withColumn("ess_micro",
        when(col("n") > 0L, expr(
          """CAST((CAST(sum_w_micro AS DECIMAL(38,0)) * sum_w_micro
            |  * 1000000) DIV __sw2 AS BIGINT)""".stripMargin)))
      .withColumn("deff_ppm",
        when(col("n") > 0L, expr(
          """CAST((CAST(n AS DECIMAL(38,0)) * __sw2 * 1000000)
            | DIV (CAST(sum_w_micro AS DECIMAL(38,0)) * sum_w_micro)
            | AS BIGINT)""".stripMargin)))
      .select(col("n"), col("n_dropped"), col("sum_w_micro"),
        col("ess_micro"), col("deff_ppm"))
  }
}
