package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join (SURVEY.md §4 / builder scale checklist): AQE's
  * skew-join handles most cases at runtime, but a *known* hot key (a
  * power-law user, a null-heavy FK) can still drown one task. Salting
  * fixes the plan shape statically:
  *
  *  - the skewed (large) side gets a random salt in [0, buckets);
  *  - the small side is replicated `buckets` times (explode of a literal
  *    range — cost = |small| · buckets rows, bounded by construction);
  *  - the join key becomes (key, salt), spreading each hot key over
  *    `buckets` tasks.
  *
  * Works for inner and left-outer (skewed side preserved) joins — each
  * skewed row exists exactly once, matched against the one replica with
  * its salt.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salting preserves multiplicity only for inner/left joins")
    val salted = skewed.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
