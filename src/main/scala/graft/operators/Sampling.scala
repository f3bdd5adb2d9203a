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
    * Null keys: `xxhash64` skips null inputs, so every null-keyed row
    * hashes as if the key column were absent and all of them share ONE
    * bucket (seed-dependent, like any other single key value). That is
    * the correct key-based-split semantics — equal keys must co-locate,
    * and null is one key — but it means a null-heavy column makes
    * per-row split fractions lumpy: all nulls land in the same split.
    * Pre-coalesce to a row-unique surrogate (e.g. `coalesce(key,
    * concat(lit("\\u0000"), rowIdCol))`) if nulls should be spread. */
  def hashBucket(key: Column, seed: Long = 42L): Column =
    pmod(xxhash64(lit(seed), key), lit(Buckets))

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
}
