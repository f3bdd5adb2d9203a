package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard tuning.
  *
  * Designed for local[N] testing but with settings that translate to a real
  * cluster: AQE on (runtime re-plan, skew-join handling, shuffle-partition
  * coalescing), shuffle partitions sized to the parallelism rather than the
  * 200 default, and a pinned UTC session timezone so results are
  * reproducible against any oracle engine.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // typed-Aggregator (udaf) partials run in ObjectHashAggregateExec,
      // whose default sort-based fallback triggers at 128 distinct keys —
      // far below any real group count, silently turning a hash partial
      // into a full sort of the input stream. 64 Ki keys keeps every
      // sketch/centroid aggregate hash-based at its actual group counts
      // while bounding worst-case partial-map memory: 2^16 keys × ~2 KiB
      // buffer (k=256-long bottom-k, the largest shipped) ≈ 128 MiB per
      // task — safe headroom, where the previous 2^20 admitted ~2 GiB
      // before the graceful sort fallback could engage
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Long sessions (a 308-query bench/verify sweep) accumulate dead
      // cached/checkpointed blocks: the ContextCleaner only frees a
      // block once the driver GC collects the RDD handle, and a large,
      // mostly-idle driver heap can go tens of minutes between full
      // GCs — in local mode driver and executor share that heap, so
      // storage memory silently fills with garbage blocks and live
      // caches start evicting/spilling (the measured 3× run-to-run
      // spread on the graph tier). Spark's own knob for exactly this
      // ships at 30min; 90s bounds the garbage window to roughly one
      // query. On a real cluster this stays harmless: a periodic
      // System.gc() on an idle driver heap is microseconds.
      .config("spark.cleaner.periodicGC.interval", "90s")
      // SQL MERGE INTO over graft MergeSink temp views (graft.plans.SqlMerge)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
