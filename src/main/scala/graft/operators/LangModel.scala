package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Bigram language-model fluency scoring — the n-gram-LM quality filter
  * of large-corpus pipelines (CCNet / KenLM shape: score each document by
  * how probable its word sequence is under a model trained on the corpus
  * itself, then gate on the score). The reference has no LM tier; this is
  * part of the LLM-data-pipeline surface the north star adds
  * (BASELINE.json), next to quality scoring (`functions.Text`) and
  * perplexity-ish repetition (`plans.RepetitionRatio`).
  *
  * Arithmetic contract: production n-gram LMs score in log-space
  * (Σ log p). `log` is libm-dependent and not bit-portable across
  * engines, so the gate metric here is the exact integer analogue — the
  * per-bigram MLE probability in parts-per-million, truncated:
  *
  *   p_ppm(w1 w2)  = (1e6 · cnt(w1,w2)) DIV cnt(w1 ·)
  *   fluency_ppm   = Σ p_ppm DIV n_bigrams          (per document)
  *
  * All quantities are nonnegative longs, so DIV (truncating) matches
  * DuckDB's `//` (flooring) and the whole score is bit-deterministic on
  * any engine and any partitioning — same discipline as
  * `Graph.pagerankMicro` and `Bm25.score`. A log-space scorer is one
  * `log(p_ppm/1e6)` away for callers that want real perplexity and can
  * live with float tolerance.
  *
  * Scale posture (100 TB): the model is O(observed bigrams) — bounded by
  * corpus vocabulary structure (Zipf), not corpus size — built with
  * map-side partial counts (one shuffle keyed by 2 words). Scoring
  * re-streams the corpus' adjacent-pair stream (narrow generator, no
  * state) and joins it to the model on (w1, w2): AQE broadcasts the
  * model when it fits, shuffle-hash otherwise. `minCount` prunes the
  * model's Zipf tail; pruned (and unseen, for cross-corpus scoring)
  * bigrams back off to p_ppm = 0 via the left join, so the join stays
  * correct when the model shrinks.
  */
object LangModel {

  /** Adjacent word-pair stream: one row (id, w1, w2) per bigram
    * OCCURRENCE. Tokenization is `Text.words` (lowercased, split on
    * whitespace). Docs with fewer than 2 words yield no rows. Narrow —
    * a per-row generator, no shuffle. */
  def bigrams(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs
      .select(id.as("doc_id"), Text.words(text).as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("__ws"), lit(1), col("__n") - 1),
        slice(col("__ws"), lit(2), col("__n") - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col("doc_id"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))

  /** Bigram MLE model: (w1, w2, cnt, head_cnt) where `head_cnt` is the
    * bigram-head marginal Σ_w2 cnt(w1, w2) — the MLE denominator.
    * One corpus shuffle for the pair counts; the marginal is derived
    * from the (small) count table, not a second corpus pass. The
    * marginal is computed BEFORE `minCount` pruning so pruning changes
    * which bigrams score, never the probability of the survivors. */
  def bigramModel(docs: DataFrame, text: Column, id: Column,
                  minCount: Long = 1L): DataFrame = {
    val cnts = bigrams(docs, text, id).groupBy("w1", "w2")
      .agg(count(lit(1)).as("cnt"))
    val heads = cnts.groupBy("w1").agg(sum(col("cnt")).as("head_cnt"))
    cnts.filter(col("cnt") >= minCount).join(heads, "w1")
  }

  /** Per-document fluency: (doc_id, n_bigrams, fluency_ppm). `model`
    * defaults to one trained on `docs` itself (self-scoring, the CCNet
    * setup); pass a pre-built [[bigramModel]] to score a new corpus
    * against a reference corpus. */
  def fluency(docs: DataFrame, text: Column, id: Column,
              model: Option[DataFrame] = None,
              minCount: Long = 1L): DataFrame = {
    val m = model.getOrElse(bigramModel(docs, text, id, minCount))
    bigrams(docs, text, id)
      .join(m.select(col("w1"), col("w2"),
        expr("(1000000L * cnt) DIV head_cnt").as("__p_ppm")),
        Seq("w1", "w2"), "left")
      .withColumn("__p_ppm", coalesce(col("__p_ppm"), lit(0L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(__p_ppm) DIV count(1)").as("fluency_ppm"))
  }
}
