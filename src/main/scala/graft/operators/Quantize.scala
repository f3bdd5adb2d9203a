package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization of embedding vectors — the
  * storage/serving compression tier of a vector corpus (4× smaller than
  * float32, SIMD int8 dot products at query time; the standard companion
  * to the ANN indexes in `Similarity`: PQ for the index, SQ for the
  * re-rank payload).
  *
  * Per vector: `scale = max|x| / 127`, `code_i = floor(x_i/scale + 0.5)`
  * (round-half-up, codes in [-127, 127]), dequantized value
  * `code_i · scale`. Every arithmetic step is a single correctly-rounded
  * IEEE double op on exactly-representable inputs (float32 widens to
  * double exactly, codes are small integers), so codes, scales, and even
  * the raw double reconstruction errors are bit-identical on any engine
  * and any partitioning — same contract as the engine's cosine kernels.
  * The all-zero vector quantizes to scale 0 with all-zero codes.
  *
  * Scale posture (100 TB): strictly narrow — one higher-order-function
  * pass per row pipelined with the scan; nothing shuffles, nothing is
  * collected. Codes stay inside the row (`array<int>`), so downstream
  * writers lay them out as a compact parquet list; the audit summary
  * aggregates per row (not per element) and ships one short row per
  * vector. */
object Quantize {

  /** Quantization codes + scale per vector, keeping `idCol`.
    * Output: (`id`, `scale`, `codes` array<int>). */
  def int8(embs: DataFrame, vecCol: String = "embedding",
           idCol: String = "vec_id"): DataFrame =
    embs.select(
      col(idCol),
      (aggregate(transform(col(vecCol), x => abs(x.cast("double"))),
        lit(0.0d), (a, x) => greatest(a, x)) / lit(127.0d)).as("scale"),
      col(vecCol).as("__v"))
      .withColumn("codes",
        when(col("scale") === 0.0d,
          transform(col("__v"), _ => lit(0).cast("int")))
          .otherwise(transform(col("__v"), x =>
            floor(x.cast("double") / col("scale") + lit(0.5d)).cast("int"))))
      .select(col(idCol), col("scale"), col("codes"))

  /** Quantize and audit in one pass: per-vector integer code summaries
    * (positional checksum Σ i·code_i, Σ code, Σ|code|, Σ code² — all
    * exact longs an oracle engine recomputes bit-for-bit) plus the
    * worst-case reconstruction error `max_i |x_i − code_i·scale|`, which
    * is ≤ scale/2 by construction (asserted in specs, auditable in SQL).
    *
    * Output: (`id`, `n_dims`, `scale`, `code_checksum`, `code_sum`,
    * `code_l1`, `code_l2sq`, `max_err`). */
  def int8Audit(embs: DataFrame, vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    // quantize inline (same formulas as int8) so the audit stays a
    // single narrow pass — no self-join back to the vector column
    val q = embs.select(
      col(idCol),
      (aggregate(transform(col(vecCol), x => abs(x.cast("double"))),
        lit(0.0d), (a, x) => greatest(a, x)) / lit(127.0d)).as("scale"),
      col(vecCol).as("__v"))
      .withColumn("codes",
        when(col("scale") === 0.0d,
          transform(col("__v"), _ => lit(0).cast("int")))
          .otherwise(transform(col("__v"), x =>
            floor(x.cast("double") / col("scale") + lit(0.5d)).cast("int"))))
    val codesL = transform(col("codes"), _.cast("long"))
    def sumL(arr: Column): Column =
      aggregate(arr, lit(0L), (a, x) => a + x)
    q.select(
      col(idCol),
      size(col("codes")).cast("long").as("n_dims"),
      col("scale"),
      sumL(zip_with(codesL, sequence(lit(1L), size(col("codes")).cast("long")),
        (c, i) => c * i)).as("code_checksum"),
      sumL(codesL).as("code_sum"),
      sumL(transform(codesL, c => abs(c))).as("code_l1"),
      sumL(transform(codesL, c => c * c)).as("code_l2sq"),
      aggregate(
        zip_with(col("__v"), col("codes"), (x, c) =>
          abs(x.cast("double") - c.cast("double") * col("scale"))),
        lit(0.0d), (a, x) => greatest(a, x)).as("max_err"))
  }
}
