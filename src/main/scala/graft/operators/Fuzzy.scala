package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.FuzzyExprs

/** Entity resolution / fuzzy record matching with blocking — the
  * standard two-phase shape: a cheap deterministic blocking key bounds
  * the candidate space, then an edit-distance predicate scores only
  * within-block pairs.
  *
  * Scale posture (the whole point of blocking): the self-join is an
  * equi-join on the block key, so candidate generation is ONE hash
  * shuffle and within-block all-pairs — O(Σ b²) over block sizes b, not
  * O(n²) over the corpus. Block-size skew is the operator's tuning
  * knob exactly as with the LSH band joins ([[TextDedup]]); callers
  * pick keys with bounded fan-out (last token, soundex, length bucket,
  * sorted-bigram prefix…) and [[blockStats]] measures the b
  * distribution before a big run.
  */
object Fuzzy {

  /** Distinct-value fuzzy pairs within blocks. Output: `block`, `name_a` <
    * `name_b`, `dist` (Levenshtein), `jw` (Jaro-Winkler, raw double —
    * callers round for display). Values are deduplicated before pairing:
    * matching is between ENTITIES (distinct strings), not rows.
    */
  def nearNames(df: DataFrame, name: Column, block: Column, maxEdits: Int): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(block.as("block"), name.as("__n")).distinct()
    val a = vals.select(col("block"), col("__n").as("name_a"))
    val b = vals.select(col("block"), col("__n").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxEdits)
      .withColumn("jw", FuzzyExprs.jaroWinkler(spark, col("name_a"), col("name_b")))
  }

  /** Sorted-neighborhood blocking (Hernández–Stolfo): the OTHER classic
    * ER candidate generator. Where [[nearNames]] pairs everything inside
    * an equality block (and misses pairs whose block key itself is
    * corrupted), sorted-neighborhood ranks all distinct values in ONE
    * global lexicographic order and pairs each value with its next
    * `window − 1` neighbors — candidates per value are CONSTANT (window
    * size), independent of corpus size and immune to mega-blocks.
    *
    * Scale shape: the global order comes from
    * [[Relational.globalRank]] (range exchange + offset cumsum — never a
    * single-partition window), neighbor pairing is an equi-join on rank
    * (each value explodes to `window − 1` rank keys), and the edit
    * distance runs only on those O(n·window) pairs. Output:
    * (`name_a` < `name_b` in sort order, `dist`, `jw`), filtered to
    * `dist <= maxEdits`. */
  def sortedNeighborhood(df: DataFrame, name: Column, window: Int,
                         maxEdits: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val spark = df.sparkSession
    // both the probe side and the join side read the ranked frame —
    // materialize it once (eager, one (name, rank) row per entity) or
    // the rank pass (exchange + per-partition sort) runs twice
    val ranked = Relational.globalRank(
      df.select(name.as("__n")).distinct(), Seq(col("__n")))
      .localCheckpoint(true)
    val probes = ranked.select(col("__n").as("name_a"),
        explode(sequence(col("rank") + 1, col("rank") + (window - 1))).as("rank"))
    probes.join(ranked.select(col("__n").as("name_b"), col("rank")), "rank")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxEdits)
      .withColumn("jw", FuzzyExprs.jaroWinkler(spark, col("name_a"), col("name_b")))
      .select("name_a", "name_b", "dist", "jw")
  }

  /** Block-size profile: rows per block and the implied pair count —
    * run this before [[nearNames]] at scale to catch a mega-block (the
    * same guard pattern as the LSH mega-bucket check). */
  def blockStats(df: DataFrame, name: Column, block: Column): DataFrame =
    df.select(block.as("block"), name.as("__n")).distinct()
      .groupBy(col("block")).agg(count(lit(1)).as("n_values"))
      .withColumn("n_pairs", col("n_values") * (col("n_values") - 1) / 2)
      .orderBy(col("n_values").desc, col("block"))

  /** Spelling-variant pairs at edit distance EXACTLY 1, found with the
    * SymSpell deletion-neighborhood trick: two terms are candidates iff
    * they share a key in {term} ∪ {term minus one char} — substitution
    * pairs share the deletion at the differing position,
    * insertion/deletion pairs share the shorter term itself. Candidate
    * keys are vocab·(len+1), so the join is LINEAR in vocabulary
    * (never vocab² — the all-pairs levenshtein this replaces), and the
    * one exact levenshtein runs only on candidates (the shared-deletion
    * test admits a few ed-2 pairs like "abc"/"bca"; the verify kills
    * them — LSH-then-verify, the [[graft.operators.TextDedup]] shape
    * in edit-distance space).
    *
    * The typo-mining readout pairs a frequent "correct" form with rare
    * variants; `minCount` prunes the vocabulary tail BEFORE key
    * generation when the long tail is noise.
    *
    * Output: `term_a` < `term_b` (each pair once), `n_a`/`n_b` LONG
    * (corpus occurrence counts), total order (term_a, term_b).
    */
  def spellingVariants(docs: DataFrame, textCol: String = "text",
                       minCount: Long = 1L): DataFrame = {
    import graft.functions.Text
    val vocab = docs
      .select(explode(Text.words(col(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .localCheckpoint(true)
    val keys = vocab.select(col("t"),
        explode(array_union(
          expr("transform(sequence(1, length(t)), i -> " +
            "concat(substr(t, 1, i - 1), substr(t, i + 1, 1000000)))"),
          array(col("t")))).as("k"))
    val cands = keys.select(col("k"), col("t").as("term_a"))
      .join(keys.select(col("k"), col("t").as("term_b")), "k")
      .filter(col("term_a") < col("term_b"))
      .select(col("term_a"), col("term_b"))
      .distinct()
      .filter(levenshtein(col("term_a"), col("term_b")) === 1)
    cands
      .join(vocab.select(col("t").as("term_a"), col("n").as("n_a")), "term_a")
      .join(vocab.select(col("t").as("term_b"), col("n").as("n_b")), "term_b")
      .select(col("term_a"), col("term_b"), col("n_a"), col("n_b"))
      .orderBy("term_a", "term_b")
  }
}
