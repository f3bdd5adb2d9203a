package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for retrieval pipelines — combining several independent
  * ranked candidate lists (BM25, dense ANN, recency, …) into one list
  * per query without score calibration.
  *
  * Reference behavior: the engine's search surface returns one ranked
  * list per retriever; production RAG/data-curation stacks fuse them
  * (reference repo has no fusion stage — this is part of the
  * LLM-pipeline tier, SURVEY.md §2.10).
  */
object Fusion {

  /** Reciprocal Rank Fusion (Cormack et al., SIGIR'09):
    * `score(d) = Σ_lists 1/(k + rank_list(d))`, the standard
    * calibration-free fusion — only RANKS cross lists, so wildly
    * different score scales (BM25 vs cosine) fuse without tuning.
    *
    * Engine-exact arithmetic: each contribution is the INTEGER
    * `1_000_000_000 DIV (k + rank)` (nano-units, exact integral
    * division — no libm, no float-summation order), summed as longs.
    * Ties in an input list break by ascending id; fused ties break by
    * ascending id. Both rules are part of the contract so any engine
    * replays the fusion bit-for-bit.
    *
    * Scale posture: per-list ranks are one window keyed by
    * (list, query) — each retriever's candidate list is bounded (top-N
    * per query), so partitions are small and skew-free by construction;
    * the fusion itself is one (query, id)-keyed aggregation with
    * map-side combine. No driver state, no all-pairs work. At 100 TB
    * the lists arrive as the bounded OUTPUT of ANN/BM25 stages, so this
    * operator's cost is O(queries · Σ list sizes), independent of
    * corpus size.
    *
    * @param lists     one DataFrame per retriever, each with
    *                  `queryCols ++ (idCol, scoreCol)` (higher score =
    *                  better)
    * @param kConst    the RRF damping constant (60 in the paper)
    * @param topK      keep only the best `topK` fused rows per query
    *                  (0 = keep all); plans to WindowGroupLimit
    * @return `queryCols ++ (idCol, n_lists, rrf_nano, fused_rank)`
    */
  def rrf(lists: Seq[DataFrame], queryCols: Seq[String], idCol: String,
          scoreCol: String, kConst: Int = 60, topK: Int = 0): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(kConst >= 1, s"kConst must be >= 1, got $kConst")
    val q = queryCols.map(col)

    // rank each list on ITS OWN score (lists may score in different
    // types/scales — only ranks cross the union), then fuse
    val ranked = lists.map { df =>
      val perList = Window.partitionBy(q: _*)
        .orderBy(col(scoreCol).desc, col(idCol).asc)
      df.select(q :+ col(idCol) :+ col(scoreCol): _*)
        .withColumn("__rank", row_number().over(perList))
        // exact integral division — floor(1e9/(k+r)) over DOUBLES could
        // round across an integer boundary; DIV on longs cannot
        .withColumn("__contrib", expr(s"1000000000L DIV (__rank + $kConst)"))
        .select(q :+ col(idCol) :+ col("__contrib"): _*)
    }.reduce(_ unionByName _)

    val fusedW = Window.partitionBy(q: _*)
      .orderBy(col("rrf_nano").desc, col(idCol).asc)
    val fused = ranked
      .groupBy(q :+ col(idCol): _*)
      .agg(count(lit(1)).cast("long").as("n_lists"),
        sum(col("__contrib")).as("rrf_nano"))
      .withColumn("fused_rank", row_number().over(fusedW).cast("long"))
    if (topK > 0) fused.filter(col("fused_rank") <= topK) else fused
  }
}
