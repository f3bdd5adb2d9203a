package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.plans.HashExprs

/** Benchmark / test-set decontamination — flag training documents that
  * share word n-grams with an evaluation set, the standard leakage
  * guard an LLM training pipeline runs before every corpus release
  * (the GPT-3 appendix-C / Gopher-style n-gram overlap check,
  * re-expressed as a Spark plan).
  *
  * Semantics: a document is contaminated iff it shares at least
  * `minOverlap` DISTINCT n-word grams (lowercased, whitespace
  * tokenization — same tokenizer as the dedup/minhash family, see
  * [[graft.plans.ShinglesN]]) with ANY benchmark text. Documents
  * shorter than `n` words have no n-grams and are never flagged —
  * gate those separately if short-text leakage matters.
  *
  * Scale shape (the benchmark side is small — MBs of eval sets vs TBs
  * of corpus — and the plan leans on that):
  *  - benchmark grams: explode → distinct → BROADCAST (no shuffle of
  *    the corpus, ever);
  *  - corpus grams: generator explode, narrow;
  *  - the broadcast hash join keeps only grams that appear in the
  *    benchmark, so the per-doc aggregation shuffles just the matched
  *    (doc, gram) pairs — at 100 TB that's O(contamination), not
  *    O(corpus);
  *  - the final flag joins back ON doc id (broadcastable when matches
  *    are few; AQE picks shuffle-hash otherwise).
  *
  * ShinglesN emits each doc's DISTINCT grams (set semantics), so the
  * per-doc match count needs no countDistinct.
  */
object Decontaminate {

  /** Distinct word n-grams of `text`, empty for docs shorter than n
    * words (ShinglesN falls back to unigrams below n — that fallback is
    * right for minhash, wrong here, so it's masked off). */
  private def grams(df: DataFrame, text: Column, n: Int): Column = {
    val spark = df.sparkSession
    // hashed grams: the overlap JOIN and per-doc counts only need gram
    // identity, and the hashed expression skips the n-gram string
    // allocation entirely (n=8 grams are the longest strings the engine
    // used to build)
    when(size(Text.words(text)) >= n,
        HashExprs.hashedShingles(spark, text, n))
      .otherwise(array().cast("array<bigint>"))
  }

  /** `docs` plus `overlap_ngrams` (distinct shared grams) and
    * `contaminated` columns. `docId` must be unique per row. */
  def flag(docs: DataFrame, docId: Column, docText: Column,
           bench: DataFrame, benchText: Column,
           n: Int = 8, minOverlap: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    for (c <- Seq("__g", "__did", "__overlap", "overlap_ngrams", "contaminated"))
      require(!docs.columns.contains(c),
        s"input already has a $c column (it would collide with flag()'s output)")
    val bg = bench
      .select(explode(grams(bench, benchText, n)).as("__g"))
      .distinct()
    val dg = docs.select(docId.as("__did"), explode(grams(docs, docText, n)).as("__g"))
    val overlaps = dg.join(broadcast(bg), "__g")
      .groupBy("__did")
      .agg(count(lit(1)).as("__overlap")) // grams are distinct per doc already
    docs.join(overlaps, docId === col("__did"), "left_outer")
      .drop("__did")
      .withColumn("overlap_ngrams", coalesce(col("__overlap"), lit(0L)))
      .drop("__overlap")
      .withColumn("contaminated", col("overlap_ngrams") >= minOverlap)
  }

  /** The corpus with contaminated documents removed (and the audit
    * columns dropped) — the "clean release" path. */
  def purge(docs: DataFrame, docId: Column, docText: Column,
            bench: DataFrame, benchText: Column,
            n: Int = 8, minOverlap: Int = 1): DataFrame =
    flag(docs, docId, docText, bench, benchText, n, minOverlap)
      .filter(!col("contaminated"))
      .drop("overlap_ngrams", "contaminated")
}
