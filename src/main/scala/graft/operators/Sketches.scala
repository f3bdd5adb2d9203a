package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "bottom-k") sketches — the mergeable distinct
  * sketch that, unlike HLL (q35/q102), also supports SET-OPERATION
  * estimates: because every sketch is the k smallest hashes of its set,
  * the union of two sketches is computable from the sketches alone
  * (merge, keep k smallest), and intersection follows by counting
  * shared survivors. A training-data pipeline uses this to estimate
  * corpus overlap — "how much of source A's user/url/doc-id space is
  * already in source B" — from kilobyte summaries instead of a
  * corpus × corpus join.
  *
  * Determinism: xxhash64 is a fixed function, the bottom-k of a set of
  * hashes is layout-independent, and the estimators below are a fixed
  * tree of IEEE ops over those hashes — same corpus, same bits, on any
  * partitioning (the correctness gate exploits exactly that).
  *
  * Scale shape: signature building is ONE mergeable
  * [[graft.functions.Aggregators.bottomKDistinct]] aggregate — the
  * bounded sorted-distinct buffer dedups and truncates map-side, so
  * the single shuffle carries one ≤k-long array per (key, partition)
  * instead of the hash stream (this replaced the round-7
  * distinct → WindowGroupLimit → collect_list cascade; bottom-k
  * distinct is canonical, so results are bit-identical). Pairwise
  * estimation then touches #keys² × k longs of SKETCH data only —
  * independent of corpus size, the entire point.
  */
object Sketches {

  /** Signed long whose order equals the UNSIGNED order of the hash —
    * flip the sign bit. Sketch arrays store flipped values sorted
    * ascending, i.e. unsigned-ascending original hashes. */
  private def flip(h: Column): Column =
    h.bitwiseXOR(lit(Long.MinValue))

  private val TwoTo63 = 9.223372036854776e18 // 2^63 as double
  private val TwoTo64 = 1.8446744073709552e19 // 2^64 as double

  /** Bottom-k hash signature of `value`'s distinct set per `key`.
    * Output: (`key`, `sig` ARRAY<LONG> — flipped hashes, unsigned-
    * ascending, length min(k, |set|), and `n_sig` = that length; a
    * signature shorter than k IS the whole set, so its estimate is
    * exact). Null values hash like any single value (one element). */
  def kmvSignatures(df: DataFrame, key: Column, value: Column,
                    k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val bk = graft.functions.Aggregators.bottomKDistinct(k)
    df.select(key.as("__k"), flip(xxhash64(value)).as("__h"))
      .groupBy(col("__k")).agg(bk(col("__h")).as("sig"))
      .select(col("__k").as("key"), col("sig"), size(col("sig")).as("n_sig"))
  }

  /** Distinct-cardinality estimate from a signature column: exact
    * |set| when the sketch holds the whole set (n < k), else the
    * classic KMV estimator (k−1)/frac(kth smallest hash), with frac
    * mapping the unsigned hash to (0, 1]. */
  def kmvDistinctEst(sig: Column, k: Int): Column = {
    val kth = element_at(sig, k) // flipped; null if size < k
    val frac = (kth.cast("double") + TwoTo63) / TwoTo64
    when(size(sig) < k, size(sig).cast("double"))
      .otherwise(lit((k - 1).toDouble) / frac)
  }

  /** Pairwise set-operation estimates between every pair of keys in a
    * signature frame (as produced by [[kmvSignatures]] with the same
    * k). For each unordered pair (a < b): distinct estimates of both
    * sides, of the union, of the intersection, and the Jaccard
    * estimate. Union sketch = k smallest of the merged signatures
    * (slice of the sorted distinct merge — pure array ops, no
    * re-hashing); intersection = (shared survivors in the union
    * sketch)/k' × |A∪B|est, the standard ratio estimator.
    *
    * Sketch-only: the join is #keys × #keys over k-long arrays. */
  def kmvPairwise(sigs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val a = sigs.select(col("key").as("key_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("key").as("key_b"), col("sig").as("sig_b"))
    val merged = array_sort(array_union(col("sig_a"), col("sig_b")))
    val kk = least(size(merged), lit(k)) // union sketch size k'
    val unionSig = slice(merged, lit(1), kk)
    val interN = size(array_intersect(
      array_intersect(col("unionSig"), col("sig_a")), col("sig_b")))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("unionSig", unionSig)
      .withColumn("est_a", kmvDistinctEst(col("sig_a"), k))
      .withColumn("est_b", kmvDistinctEst(col("sig_b"), k))
      .withColumn("est_union", kmvDistinctEst(col("unionSig"), k))
      .withColumn("jaccard_est", interN.cast("double") / size(col("unionSig")))
      .withColumn("est_intersect", col("jaccard_est") * col("est_union"))
      .select(col("key_a"), col("key_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersect"), col("jaccard_est"))
  }

  /** Roll fine-grained KMV sketches up to a coarser key WITHOUT
    * touching the raw data — the mergeability that makes sketch TABLES
    * the production pattern for distinct rollups: build per-(dim, day)
    * sketches once at ingest, then answer per-dim (or any coarser)
    * distinct questions forever after from kilobytes of sketch instead
    * of a corpus rescan.
    *
    * Merge validity: if a hash is among the union's k smallest, then
    * fewer than k hashes in the WHOLE union are below it, so it is in
    * the bottom-k of whichever input set contains it — the union's
    * true bottom-k always survives in the concatenated sketches (the
    * [[graft.operators.Graph.twoHopReachKmv]] argument). The rolled-up
    * sketch is therefore IDENTICAL to one built directly from the raw
    * union — array-equal, not just statistically equivalent — which is
    * the invariant the gate asserts.
    *
    * Shape: ONE [[graft.functions.Aggregators.bottomKDistinctMerge]]
    * aggregate — each fine sketch is already a sorted distinct array,
    * so the rollup is one linear two-pointer merge per input key,
    * map-side combined (replaced the round-7
    * explode → distinct → WindowGroupLimit → collect cascade;
    * bit-identical, bottom-k is canonical). Everything sketch-sized.
    * Input (`key`, `sig`) as from [[kmvSignatures]] with the SAME k;
    * `toKey` maps the fine key to the coarse one. Output: (`key`,
    * `sig`, `n_sig`, `distinct_est`). */
  def kmvRollup(sigs: DataFrame, toKey: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val bkm = graft.functions.Aggregators.bottomKDistinctMerge(k)
    sigs.select(toKey.as("__k"), col("sig"))
      .groupBy(col("__k")).agg(bkm(col("sig")).as("sig"))
      .select(col("__k").as("key"), col("sig"),
        size(col("sig")).as("n_sig"),
        kmvDistinctEst(col("sig"), k).as("distinct_est"))
  }

  /** Count-Min sketch: `depth × width` counters summarizing a frequency
    * distribution, with the one-sided guarantee est ≥ true for every
    * key (each of the key's `depth` counters holds its full count plus
    * whatever collided in) and est ≤ true + εN in expectation per row
    * (ε = e/width). Mergeable by cell-wise ADDITION — the property that
    * makes it the streaming/partitioned counterpart of exact heavy
    * hitters (q71): per-shard sketches sum into the corpus sketch with
    * zero re-reads.
    *
    * Scale shape: the depth-way explode is a narrow generator; the
    * aggregate is map-side combined, so the shuffle carries at most
    * depth·width rows per task — the SKETCH size, not the corpus. */
  def countMin(df: DataFrame, value: Column, depth: Int,
               width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth >= 1, width >= 2; got ($depth, $width)")
    df.select(value.as("__v"),
        explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("d"), pmod(xxhash64(col("d"), col("__v")), lit(width)).as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `keys` (one row per distinct key)
    * against a [[countMin]] sketch with the same depth/width: the min
    * of the key's `depth` counters. The sketch side is depth·width
    * rows — broadcast at any sane size. Missing cells count 0 (the key
    * never occurred). Output: (`key`, `est`). */
  /** Per-key KLL quantile sketches (Karnin–Lang–Liberty '16, the
    * DataSketches build Spark 4 ships) — the QUANTILE analogue of
    * [[kmvSignatures]]: build once at fine grain (e.g. per day), keep
    * kilobytes per key, answer any later percentile question over any
    * rollup of keys WITHOUT re-reading the corpus. `k` trades size for
    * the rank-error guarantee (k = 200 ≈ 1.7% normalized rank error,
    * 99.9% confidence).
    *
    * Determinism note: unlike KMV's canonical sorted bottom-k, a KLL
    * sketch's BINARY form depends on merge order — so gates built on
    * it must assert rank-error INVARIANTS (and the exact row count,
    * which KLL carries losslessly), never estimate equality; the q289
    * probe does exactly that.
    *
    * Output: `key`, `sketch` BINARY, `n` LONG (exact rows summarized).
    */
  def kllQuantileSketches(df: DataFrame, key: Column, value: Column,
                          k: Int = 200): DataFrame = {
    require(k >= 8 && k <= 65535, s"KLL k must be in 8..65535, got $k")
    df.select(key.cast("string").as("key"), value.cast("long").as("__v"))
      .filter(col("key").isNotNull && col("__v").isNotNull)
      .groupBy(col("key"))
      .agg(expr(s"kll_sketch_agg_bigint(__v, $k)").as("sketch"))
      .withColumn("n", expr("kll_sketch_get_n_bigint(sketch)"))
  }

  /** Merge per-fine-key KLL sketches up to a coarser key and read out
    * quantiles — the companion of [[kmvRollup]] for percentiles: any
    * slice's p50/p90/p99 from kilobytes of pre-built state instead of
    * a corpus re-scan (the latency-dashboard / SLA-rollup shape at
    * 100 TB). The merge aggregate is sketch-sized; nothing touches
    * rows. `n` stays EXACT under merging (KLL counts losslessly);
    * quantile estimates carry the k-determined rank-error bound.
    *
    * Output: `key`, `n` LONG, `p50`, `p90`, `p99` LONG (value-domain
    * estimates) + `sketch` BINARY for further rollups — total order by
    * key.
    */
  def kllRollup(sketches: DataFrame, toKey: Column): DataFrame = {
    sketches.select(toKey.as("__k"), col("sketch"))
      .groupBy(col("__k"))
      .agg(expr("kll_merge_agg_bigint(sketch)").as("sketch"))
      .select(col("__k").as("key"), col("sketch"),
        expr("kll_sketch_get_n_bigint(sketch)").as("n"),
        expr("kll_sketch_get_quantile_bigint(sketch, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_bigint(sketch, 0.9)").as("p90"),
        expr("kll_sketch_get_quantile_bigint(sketch, 0.99)").as("p99"))
      .orderBy(col("key"))
  }

  /** Point-frequency estimates for `keys` (one row per distinct key)
    * against a [[countMin]] sketch with the same depth/width: the min
    * of the key's `depth` counters. The sketch side is depth·width
    * rows — broadcast at any sane size. Missing cells count 0 (the key
    * never occurred). Output: (`key`, `est`). */
  def cmEstimate(sketch: DataFrame, keys: DataFrame, key: Column,
                 depth: Int, width: Int): DataFrame = {
    val probes = keys.select(key.as("key")).distinct()
      .select(col("key"), explode(array((0 until depth).map(lit): _*)).as("d"))
      .select(col("key"), col("d"),
        pmod(xxhash64(col("d"), col("key")), lit(width)).as("bucket"))
    probes.join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
