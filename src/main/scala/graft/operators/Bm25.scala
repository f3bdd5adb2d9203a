package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BM25 text retrieval — score every document containing at least one
  * query term (Robertson/Okapi BM25 with the Lucene +1 idf so scores
  * stay positive):
  *
  *   idf(t)    = ln(1 + (N − df + 0.5)/(df + 0.5))
  *   score_t   = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *   score(d)  = Σ_{t ∈ q ∩ d} score_t
  *
  * This is the retrieval primitive a training-data pipeline uses for
  * targeted corpus search (mining domain documents, sourcing eval
  * neighbors) without an external search engine.
  *
  * Scale posture: the token explode filters to QUERY TERMS before
  * anything shuffles — per-doc work is a codegen'd token scan, the
  * document length rides along with the exploded rows (no join back),
  * and the only wide op on real data is the (doc, term)-keyed count
  * over the filtered (tiny) slice. Document frequencies and corpus
  * stats are a handful of rows, broadcast. No inverted index is
  * materialized; the corpus streams twice — once for the corpus-wide
  * length stats (N, avgdl), once for the term match. Repeated-query
  * workloads precompute both: persist the (term, doc, tf, dl) frame
  * bucketed by term and the one-row stats table, and each query
  * becomes an index lookup.
  *
  * Determinism contract (the cross-engine oracle rides on it): per-term
  * scores are computed in ONE fixed IEEE op order, floor-rounded to
  * 1e-6 as integer micro-units, and summed EXACTLY as longs — no
  * float-summation-order dependence anywhere. The only cross-engine
  * risk left is the last ulp of ln(), below the rounding grain.
  *
  * Output: `doc_id`, `n_terms` (distinct query terms present), `score`
  * (micro-unit-exact DOUBLE), one row per matching document.
  */
object Bm25 {

  def score(docs: DataFrame, docId: Column, text: Column, terms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // tokens are lowercased (Text.words), so terms must be too — fold
    // here rather than trap a caller passing "Spark" into zero matches
    val qTerms = terms.map(_.toLowerCase)
    val base = docs.select(docId.as("doc_id"), Text.words(text).as("__toks"))
    val stats = base.select(size(col("__toks")).as("__dl")).agg(
      count(lit(1)).cast("double").as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl"))

    // dl rides along with the exploded rows: first(__dl) after the
    // (doc, term) count is exact (it's constant per doc) and saves the
    // per-doc-length join — and with it a third corpus scan
    val tf = base
      .select(col("doc_id"), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"), first(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy(col("__t"))
      .agg(count(lit(1)).cast("double").as("__df"))

    // one fixed op order, mirrored textually by the oracle SQL:
    //   idf   = ln(1 + (n - df + 0.5) / (df + 0.5))
    //   denom = tf + k1 * (1 - b + b * dl / avgdl)
    //   s     = idf * (tf * (k1 + 1)) / denom
    val scored = tf
      .join(broadcast(dfreq), "__t")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))))
      .withColumn("__denom",
        col("__tf") + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("__dl").cast("double") / col("__avgdl")))
      .withColumn("__micro",
        floor(col("__idf") * (col("__tf") * lit(k1 + 1)) / col("__denom")
          * 1000000.0 + 0.5).cast("long"))

    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        (sum(col("__micro")).cast("double") / 1000000.0).as("score"))
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 move, with the
    * engine's integer discipline): take the top `kDocs` documents for
    * the query, mine the terms that make the feedback set distinctive,
    * return the top `mTerms` as expansion candidates — feed
    * `terms ++ expansion` back into [[score]] for the expanded run.
    *
    * Deterministic simplification, documented: feedback docs are
    * selected by EXACT query-term occurrence count (ties → lowest
    * doc_id), not by the float BM25 score — selection, weights, and
    * ranking are then all exact integers, engine-replayable to the
    * last bit. Expansion weight is feedback mass × linear idf (the
    * `tfidfTopTerms`/q131 rationale — same ranking as log idf, no
    * libm):
    *
    *   w_ppm(t) = Σ_{d ∈ F} tf(t, d) · ((10⁶·N) DIV df(t))
    *
    * Scale posture: the occurrence filter prunes to query-term postings
    * BEFORE any shuffle; the feedback set is kDocs rows (a driver-free
    * top-k via orderBy+limit → TakeOrderedAndProject); candidate mining
    * touches only the feedback docs' tokens (semi-join pruned scan);
    * corpus df attaches via the vocabulary-sized aggregate. Original
    * query terms are excluded from the expansion.
    *
    * Output: (`term`, `fb_tf`, `df`, `w_ppm`, `rank`), rank 1..mTerms
    * by (w_ppm desc, term asc). */
  def prfExpansion(docs: DataFrame, docId: Column, text: Column,
                   terms: Seq[String], kDocs: Int = 10,
                   mTerms: Int = 10): DataFrame = {
    require(terms.nonEmpty && kDocs >= 1 && mTerms >= 1,
      "need query terms, kDocs >= 1, mTerms >= 1")
    val qTerms = terms.map(_.toLowerCase)
    val base = docs.select(docId.as("doc_id"), Text.words(text).as("__toks"))

    val feedback = base
      .select(col("doc_id"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(qTerms: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("__hits"))
      .orderBy(col("__hits").desc, col("doc_id").asc)
      .limit(kDocs)
      .select(col("doc_id"))

    val fbTf = base.join(feedback, "doc_id")
      .select(explode(col("__toks")).as("term"))
      .filter(!col("term").isin(qTerms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("fb_tf"))

    val corpusTf = base
      .select(col("doc_id"), explode(array_distinct(col("__toks"))).as("term"))
    val dfreq = corpusTf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = base.agg(count(lit(1)).as("__n"))

    val w = BoundedWindow.ordered(col("term"), col("w_ppm").desc, col("term").asc)
    fbTf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("w_ppm", expr("fb_tf * ((1000000L * __n) DIV df)"))
      .orderBy(col("w_ppm").desc, col("term").asc)
      .limit(mTerms)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("term"), col("fb_tf"), col("df"), col("w_ppm"), col("rank"))
  }
}
