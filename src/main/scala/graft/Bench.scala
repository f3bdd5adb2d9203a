package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, writes the complete per-query map to
  * BENCH_FULL.json, and prints one COMPACT JSON line (total + slowest
  * 35 queries) sized to fit a 2000-char log tail.
  *
  * Queries execute into the `noop` sink — a count() would let Catalyst
  * prune projections and eliminate sorts, timing a cheaper plan than the
  * one users run.
  *
  * Methodology: one q01 pass absorbs JVM/context startup, then every
  * query runs as a block — ONE untimed warm-up pass (codegen, parquet
  * footer cache, broadcast reuse) immediately followed by
  * `SPARK_GRAFT_BENCH_ITERS` timed runs (default 3) — and the reported
  * number is the per-query MEDIAN of the timed runs. Sub-second queries
  * used to flap over budget purely on session warm-up order; excluding
  * the warm-up run from the sample kills that noise at the protocol
  * level. Per-query spread (max−min of the timed runs) lands in
  * BENCH_FULL.json so a noisy box is distinguishable from a real
  * regression. q40 (IVF ANN) additionally reports its two phases split:
  * k-means training (flat cost — fit on a bounded sample) vs search
  * (the part that scales with corpus size).
  */
object Bench {
  // Adversarial-mode heap ballast — pinned in a field so it stays
  // strongly reachable for the whole run (see below).
  private var ballast: Array[Array[Long]] = _

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    require(iters >= 1, s"SPARK_GRAFT_BENCH_ITERS must be >= 1, got $iters")
    // SPARK_GRAFT_BENCH_ADVERSE=1: pin ~40% of the max heap as
    // unreclaimable ballast BEFORE the session exists, so the whole
    // sweep runs under genuine memory pressure — storage blocks evict,
    // execution spills, GC runs hot. Spark's unified memory manager
    // sizes itself from the heap and cannot see the ballast, which is
    // exactly the adversarial point: budgets frozen on a friendly box
    // must also hold here, or they are not reproducible numbers. The
    // mode is recorded in the output line ("adverse":true) so budget
    // provenance can name the run.
    val adverse = sys.env.get("SPARK_GRAFT_BENCH_ADVERSE").contains("1")
    if (adverse) {
      val chunkElems = 1 << 20 // 1 Mi longs = 8 MiB per block
      val nChunks =
        ((Runtime.getRuntime.maxMemory() * 0.4) / (chunkElems * 8L)).toInt
      ballast = Array.fill(nChunks)(new Array[Long](chunkElems))
      System.err.println(s"[bench] ADVERSE mode: pinned ${nChunks * 8} MiB " +
        s"of ${Runtime.getRuntime.maxMemory() >> 20} MiB max heap")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // favor fewer, fuller post-shuffle partitions over max parallelism:
      // at bench scale the fixed task-scheduling overhead dominates
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536") // see GraftSession: hash-based sketch partials, bounded map memory
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bound dead-block accumulation across the 308-query sweep (see
      // GraftSession: ContextCleaner frees blocks only after driver GC)
      .config("spark.cleaner.periodicGC.interval", "90s")
      // graft SQL functions, as-of join, MERGE INTO lowering
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable =>
        System.err.println(s"[bench] failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Time the raw operator (Probe.benchRun) where the gate query wraps
    // it in a self-oracle audit — the audit's bounded exact-truth pass
    // would otherwise dominate and mask operator regressions.
    val benchBodies: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      graft.queries.Probes.all.map(p => p.name -> p.benchRun.getOrElse(p.run)).toMap

    def exec(name: String): Double =
      time(benchBodies(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())

    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.length / 2)
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    exec(names.head) // session warmup: JVM + codegen + parquet footer cache

    // per-query block: one UNTIMED warm-up pass, then the timed runs —
    // warm-up cost never enters the sample (see methodology above)
    val samples: Map[String, Seq[Double]] =
      names.map { n =>
        exec(n)
        n -> (1 to iters).map(_ => exec(n))
      }.toMap

    // q40 phase split: train once per iteration, search against the
    // pre-trained centroids — median of each phase. A q40 failure must
    // report -1 like any other query, not abort the whole bench line.
    val q40Train = median((1 to iters).map(_ =>
      time { graft.queries.Probes.ivfTrainStage(spark, sfDir) }))
    val q40Search =
      try {
        val cents = graft.queries.Probes.ivfTrainStage(spark, sfDir)
        median((1 to iters).map(_ =>
          time(graft.queries.Probes.ivfSearchStage(spark, sfDir, cents)
            .write.format("noop").mode("overwrite").save())))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] q40 split failed: ${e.getMessage}")
        -1.0
      }

    val medians = names.map(n => n -> median(samples(n)))
    val total = medians.map(_._2).filter(_ >= 0).sum
    def sec(v: Double): String = f"$v%.3f"

    // Self-binding drift gate: BENCH_BUDGET.json freezes a known-good
    // round's per-query medians; any query now above 2× its budget is
    // flagged in the parsed line (n_over_budget), so regressions are
    // machine-visible instead of hand-adjudicated each round. New
    // queries without a budget entry are skipped (they get frozen when
    // the budget file is next refreshed).
    // a missing/unreadable budget file must be DISTINGUISHABLE from
    // "everything within budget" (the searchLshIndex lesson): the gate
    // reports -1, never a fake 0
    val budgets: Option[Map[String, Double]] =
      try {
        val txt = java.nio.file.Files.readString(
          java.nio.file.Paths.get("BENCH_BUDGET.json"))
        val qsBlock = txt.substring(txt.indexOf("\"queries\""))
        Some(""""(q[0-9]+[a-z0-9_]*)"\s*:\s*([0-9.]+)""".r
          .findAllMatchIn(qsBlock)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap)
          .filter(_.nonEmpty)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] BENCH_BUDGET.json unreadable " +
          s"(${e.getMessage}) — drift gate reports n_over_budget=-1")
        None
      }
    // relative AND absolute: 87 queries have sub-0.5 s budgets, where
    // a loaded box doubles times by scheduling noise alone — a flag
    // needs v > 2× budget AND at least one absolute second of
    // regression, so the gate trips on real plan changes, not jitter
    val overBudget = medians.filter { case (n, v) =>
      v >= 0 && budgets.exists(_.get(n).exists(b =>
        v > 2.0 * b && v - b > 1.0))
    }
    val nOverBudget = budgets.fold(-1)(_ => overBudget.size)
    overBudget.foreach { case (n, v) =>
      System.err.println(f"[bench] OVER BUDGET $n: $v%.3f s > 2x " +
        f"${budgets.flatMap(_.get(n)).getOrElse(Double.NaN)}%.3f s")
    }

    // Full per-query line → file. The driver's log capture keeps only
    // the LAST ~2000 chars of output, and a 200+-query map overflows
    // it — so stdout gets a COMPACT line (headline total + the slowest
    // queries) sized to survive the tail window, and the complete map
    // lands in BENCH_FULL.json next to the repo's round artifacts.
    val qsFull = medians.map { case (k, v) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    // per-query spread (max−min of the timed runs): noise diagnostic —
    // a query over budget with a tight spread is a real regression, one
    // with a wide spread is a loaded box
    val spreadFull = names.map { n =>
      val ok = samples(n).filter(_ >= 0)
      val sp = if (ok.size >= 2) ok.max - ok.min else -1.0
      "\"" + n + "\":" + sec(sp)
    }.mkString("{", ",", "}")
    val overList = overBudget.map { case (k, v) =>
      "\"" + k + "\":" + sec(v)
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec",""" +
        s""""iters":$iters,"n_queries":${medians.size},""" +
        s""""adverse":$adverse,"n_over_budget":$nOverBudget,""" +
        s""""over_budget":$overList,"queries":$qsFull,"spread":$spreadFull,""" +
        s""""q40_split":{"train":${sec(q40Train)},"search":${sec(q40Search)}},""" +
        s""""sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_FULL.json write failed: ${e.getMessage}")
    }

    val failed = medians.filter(_._2 < 0).map(_._1)
    val slowest = medians.filter(_._2 >= 0).sortBy(-_._2).take(35)
    val qsCompact = (slowest ++ failed.map(_ -> -1.0)).sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${sec(total)},"unit":"sec",""" +
        s""""iters":$iters,"n_queries":${medians.size},""" +
        s""""adverse":$adverse,""" +
        s""""n_failed":${failed.size},"n_over_budget":$nOverBudget,""" +
        s""""queries":$qsCompact,""" +
        s""""q40_split":{"train":${sec(q40Train)},"search":${sec(q40Search)}},""" +
        s""""note":"queries = slowest 35 of ${medians.size}; full map in BENCH_FULL.json",""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
