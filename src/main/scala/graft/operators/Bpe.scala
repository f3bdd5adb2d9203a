package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Byte-pair-encoding tokenizer: train a merge table on a bounded corpus
  * sample, then tokenize/count at corpus scale with a native expression
  * ([[graft.plans.BpeCount]]). Token counting is the budgeting primitive
  * of an LLM data pipeline (context packing, mixture weighting, cost
  * estimates all operate in tokens, not words).
  *
  * Training is the standard character-level BPE recipe (Sennrich et al.
  * 2016, re-derived from the published algorithm): start from single
  * characters within each word, repeatedly merge the most frequent
  * adjacent symbol pair. Determinism: ties break to the
  * lexicographically SMALLEST pair, and the sample is the lowest-id
  * `maxSample` documents — same bounded-deterministic-sample contract
  * as the IVF/PQ codebook trainers, so training cost is flat in corpus
  * size and the merge table is reproducible on any layout.
  *
  * Apply semantics (shared by the HOF reference [[segmentWord]] and the
  * native expression, which the spec cross-checks bitwise): repeatedly
  * find the adjacent pair with the LOWEST merge rank and fuse ALL its
  * non-overlapping occurrences left-to-right, until no adjacent pair is
  * in the table. Words (lowercased whitespace tokens — Text.words
  * semantics) never merge across boundaries.
  */
object Bpe {

  /** Ordered merge table from a bounded sample. */
  def train(docs: DataFrame, text: Column, idCol: Column, nMerges: Int,
            maxSample: Int = 2048): Seq[(String, String)] = {
    val wordFreq: Seq[(String, Long)] = docs
      .orderBy(idCol)
      .limit(maxSample)
      .select(explode(Text.words(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toSeq.sortBy(_._1) // stable driver-side order

    var vocab: Vector[(Vector[String], Long)] =
      wordFreq.map { case (w, c) => w.map(_.toString).toVector -> c }.toVector
    val merges = mutable.ArrayBuffer.empty[(String, String)]

    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        // max count, ties → lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, c) => (fuse(syms, best), c) }
        i += 1
      }
    }
    merges.toSeq
  }

  private def fuse(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += (syms(j) + syms(j + 1)); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** HOF reference encoder for ONE word — the test oracle for the native
    * expression. */
  def segmentWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; best = (syms(j), syms(j + 1)) }
        }
        j += 1
      }
      if (best == null) done = true
      else syms = fuse(syms, best)
    }
    syms
  }

  /** Reference token count for a whole document (drives the q79
    * agreement audit as a UDF; the native expression is the hot path). */
  def countTokensRef(text: String, ranks: Map[(String, String), Int]): Int = {
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    lowered.split("\\s+").filter(_.nonEmpty)
      .map(w => segmentWord(w, ranks).length).sum
  }
}
