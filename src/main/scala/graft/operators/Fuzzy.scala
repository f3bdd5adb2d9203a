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

  /** Block-size profile: rows per block and the implied pair count —
    * run this before [[nearNames]] at scale to catch a mega-block (the
    * same guard pattern as the LSH mega-bucket check). */
  def blockStats(df: DataFrame, name: Column, block: Column): DataFrame =
    df.select(block.as("block"), name.as("__n")).distinct()
      .groupBy(col("block")).agg(count(lit(1)).as("n_values"))
      .withColumn("n_pairs", col("n_values") * (col("n_values") - 1) / 2)
      .orderBy(col("n_values").desc, col("block"))
}
