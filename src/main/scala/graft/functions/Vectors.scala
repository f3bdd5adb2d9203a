package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * higher-order functions (`zip_with` + `aggregate`) so the whole
  * computation stays inside Catalyst codegen — no UDF serialization, no
  * row-by-row Scala closures in the hot path.
  *
  * All arithmetic is done in double after an explicit cast: (a) IEEE
  * double ops on identical inputs are bit-deterministic across engines,
  * which the DuckDB oracle needs; (b) left-fold accumulation order matches
  * DuckDB's sequential list_dot_product.
  */
object Vectors {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null rather
    * than a division error under ANSI mode). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom)
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v))

  /** Deterministic random-hyperplane (SRP) signature for cosine LSH: bit i
    * is the sign of `v · h_i` with h_i drawn from a seeded Gaussian at
    * PLAN time (java.util.Random's algorithm is spec-fixed, so the planes
    * — and therefore buckets — are identical on every run and executor;
    * they ship to executors as literals). Returns a LongType bucket id of
    * `bits` sign bits. Vectors in the same bucket have small angular
    * distance with high probability.
    */
  def hyperplaneBucket(v: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    require(bits <= 62, "bucket bits must fit a long")
    val rng = new java.util.Random(seed)
    val planes: Seq[Column] = (0 until bits).map { _ =>
      val h = array((0 until dim).map(_ => lit(rng.nextGaussian())): _*)
      when(dot(v, h) >= 0, lit(1L)).otherwise(lit(0L))
    }
    planes.zipWithIndex.map { case (bit, i) => bit * lit(1L << i) }
      .reduce(_ + _)
  }
}
