package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus-level term statistics for training-data curation: document
  * frequency, TF-IDF term salience, top-terms-per-document.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - tokenization is a narrow per-row transform pipelined with the scan;
  *  - term frequency aggregates on (doc, term) with map-side partial
  *    aggregation — the shuffle carries one row per distinct (doc, term),
  *    not one per token;
  *  - document frequency re-aggregates the tf frame on term alone
  *    (vocabulary-sized output);
  *  - the df side of the scoring join is vocabulary-sized, orders of
  *    magnitude smaller than the tf side, so Spark's size estimates (or
  *    AQE at runtime) broadcast it; the corpus-size scalar crosses as an
  *    explicit one-row broadcast;
  *  - everything downstream of tf is sized by |vocabulary| and
  *    |doc × distinct-term|, never by raw token count.
  */
object CorpusStats {

  /** Term frequency per document: one row per (doc, term) with its
    * occurrence count. Empty/null documents yield no rows. */
  def termFrequencies(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), explode(Text.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term (in how many documents it appears),
    * computed from the tf frame — one row per (doc, term) — so each
    * document counts once however often the term repeats inside it. */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Top-k most salient terms per document by TF-IDF with LINEAR inverse
    * document frequency: `score = tf · N / df`.
    *
    * Linear (not log) idf, deliberately: the ranking it induces per
    * document is identical to log-idf's for any monotone idf, and the
    * score stays bit-deterministic across engines — `tf·N` is integer
    * exact and the single IEEE division cannot drift, while `ln` is a
    * libm call with no cross-engine bit guarantee (SURVEY.md §2.11:
    * never gate on libm). Ties break on the term string ascending.
    *
    * Output: (idCol, term, tf, df, score, rnk) with rnk in 1..k. */
  def tfidfTopTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = termFrequencies(docs, idCol, textCol)
    val dfreq = documentFrequencies(tf)
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("__n")).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"),
        col("rnk").cast("long").as("rnk"))
  }
}
