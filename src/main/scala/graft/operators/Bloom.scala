package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter membership pruning — the explicit form of the runtime
  * filter Spark's optimizer injects for shuffle joins
  * (`InjectRuntimeFilter`), exposed as an operator so a pipeline can
  * build a key sketch ONCE and reuse it across many jobs (the optimizer
  * version rebuilds per query and only fires under narrow plan
  * conditions).
  *
  * Why it matters at 100 TB: a semi/inner join keyed on a selective
  * build side still SHUFFLES every probe-side row before the join drops
  * the misses. A bloom pre-filter drops them at the SCAN, before the
  * exchange — the shuffle then carries only (true matches + the
  * configured false-positive sliver). No false negatives, ever: the
  * pruned frame is always a superset of the exact semi-join.
  *
  * Execution shape: the sketch is built by Spark's own mergeable
  * [[BloomFilterAggregate]] (map-side partials in Tungsten, one binary
  * blob out), and membership is Spark's codegen'd
  * [[BloomFilterMightContain]] over `xxhash64(key)` — the exact pair of
  * expressions the built-in runtime filter uses, so the probe filter
  * whole-stage-codegens and pushes nothing through a UDF.
  *
  * The sketch itself is a driver-side value (size = numBits/8, e.g.
  * ~1.2 MB for 1M keys at 1% fpp — same order as a broadcast dim) and
  * embeds in plans as a foldable literal, so one sketch serves any
  * number of subsequent queries, including streaming micro-batches.
  *
  * Reference behavior: generalizes the reference dashboard's
  * city-membership pruning (`app/dashboard.py` city picker filters) to
  * arbitrary-cardinality key sets where an IN-list or broadcast join
  * stops being practical.
  */
object Bloom {

  /** Register the two catalyst expressions (Spark 4 removed public
    * `new Column(expr)`; the session FunctionRegistry is the seam). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering per call floods logs with
    // "SimpleFunctionRegistry ... replaced a previously registered
    // function" warnings (one per query in a bench run)
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bloom_agg"))) return
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Standard optimal sizing: bits = -n·ln(p)/ln(2)², clamped to ≥64. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    require(expectedItems > 0, s"expectedItems must be positive")
    math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
  }

  /** Build the serialized sketch over `xxhash64(key)` in one distributed
    * aggregation pass (this is an ACTION — it runs a job). NULL keys are
    * not inserted, mirroring SQL join semantics where NULL matches
    * nothing. */
  def sketch(df: DataFrame, key: Column, expectedItems: Long,
             fpp: Double = 0.01): Array[Byte] = {
    ensureRegistered(df.sparkSession)
    val bits = optimalNumBits(expectedItems, fpp)
    // BloomFilterAggregate silently CLAMPS numItems/numBits to the
    // runtime-filter conf maxima (4M items / 64M bits by default) —
    // above that the requested fpp would quietly explode. Refuse loudly
    // instead; the caller raises the confs for genuinely bigger sides.
    val conf = df.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && bits <= maxBits,
      s"sketch needs $expectedItems items / $bits bits but the engine caps at " +
        s"$maxItems / $maxBits — raise spark.sql.optimizer.runtime.bloomFilter." +
        s"maxNumItems/maxNumBits (cost: numBits/8 bytes per plan) or accept a " +
        s"higher fpp")
    df.filter(key.isNotNull)
      .select(call_function("graft_bloom_agg", xxhash64(key),
        lit(expectedItems), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership test column: true iff `key` MIGHT be in the sketched set
    * (false ⇒ definitely absent). NULL keys test false, mirroring join
    * semantics. */
  def mightContain(sketchBytes: Array[Byte], key: Column): Column =
    key.isNotNull &&
      call_function("graft_bloom_contains", lit(sketchBytes), xxhash64(key))

  /** Prune `probe` to rows whose `probeKey` might appear among
    * `buildKey` values of `build`: a guaranteed superset of the exact
    * semi-join, with ~fpp extra rows. Use when `build`'s keys are too
    * many for an IN-list but the join itself would shuffle a large
    * `probe` mostly to discard it. */
  def semiPrune(probe: DataFrame, probeKey: Column,
                build: DataFrame, buildKey: Column,
                expectedItems: Long, fpp: Double = 0.01): DataFrame =
    probe.filter(mightContain(sketch(build, buildKey, expectedItems, fpp), probeKey))
}
