package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship / golden-record merge: collapse each duplicate cluster
  * into ONE record by picking, PER FIELD, the best non-null value — the
  * MDM step after entity resolution ([[TextDedup.dedupClusters]] /
  * [[Fuzzy]] / [[TextDedup.dedupRepresentatives]] decide WHICH rows are
  * the same entity; this decides what the merged record says). Fieldwise
  * beats row-wise exactly when the best row is missing a field another
  * cluster member has.
  *
  * Selection rule per field: highest (value-present, quality, id) —
  * deterministic on any layout because the triple is totally ordered
  * (ids unique by contract). Implemented as ONE max(struct(...)) per
  * field inside a single cluster-keyed aggregate: one shuffle carrying
  * small partials, no windows, no joins — the same map-side-combinable
  * shape as any grouped agg, so it scales like one.
  */
object Golden {

  /** @param fields (outputSuffix, valueExpr) pairs; each yields a
    *   `golden_<suffix>` column. Output: `cluster`, `n_members` LONG,
    *   the golden fields, total order by cluster. */
  def goldenRecords(df: DataFrame, cluster: Column, id: Column,
                    quality: Column,
                    fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val base = df.select(
      Seq(cluster.as("cluster"), id.as("__id"),
        quality.cast("long").as("__q")) ++
        fields.map { case (n, c) => c.as(s"__f_$n") }: _*)
    val aggs = fields.map { case (n, _) =>
      max(struct(
        col(s"__f_$n").isNotNull.cast("int").as("p"),
        col("__q").as("q"), col("__id").as("i"),
        col(s"__f_$n").as("v"))).getField("v").as(s"golden_$n")
    }
    base.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), aggs: _*)
      .orderBy("cluster")
  }

  /** Fellegi–Sunter linkage weights (F&S '69) — the probabilistic
    * record-linkage model behind every serious entity-resolution stack
    * (Splink et al.): from a LABELED pairs frame (is_match + per-field
    * agreement booleans), estimate per field
    *
    *   m = P(agree | match),  u = P(agree | non-match)
    *
    * and the log-odds scoring weights a downstream comparison sums:
    * w_agree = ln(m/u), w_disagree = ln((1−m)/(1−u)). A field that
    * agrees often among matches but rarely among random pairs (email:
    * m≈.95, u≈.001) earns a large positive agreement weight; weak
    * fields (city) earn small ones — replacing hand-tuned fuzzy-score
    * thresholds with calibrated evidence.
    *
    * Exactness: counts exact; m/u are truncating ppm quotients CLAMPED
    * to [1, 10⁶−1] with the clamp COUNTED per field (`n_clamped` — the
    * [[graft.operators.Classify.logLoss]] posture: a 0 or 1 rate makes
    * the log-odds infinite, and silence would hide it); each weight is
    * ONE pinned nano-quantized ln of those exact ppm integers. NULL
    * agreement values are counted per field (`n_null_cmp`) and join
    * neither numerator nor denominator.
    *
    * Scale posture: ONE map-side-combined aggregate over the pairs
    * frame computes every field's four counts at once (fields fan out
    * as columns, not rows); the output is |fields| rows unpivoted from
    * that single row. The labeled frame is the expensive input — build
    * it from a bounded review sample or a [[graft.operators.TextDedup]]
    * high-confidence seed, not all pairs.
    *
    * Output (one row per field): `field`, `n_match`, `n_nonmatch`,
    * `agree_m`, `agree_u`, `n_cmp_m`, `n_cmp_u` (non-null comparison
    * denominators), `n_null_cmp`, `n_clamped`, `m_ppm`, `u_ppm` LONG,
    * `w_agree_nano`, `w_disagree_nano` LONG — total order by field.
    */
  def linkageWeights(pairs: DataFrame, isMatch: Column,
                     fields: Seq[(String, Column)]): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    val base = pairs.select(isMatch.cast("boolean").as("__m") +:
        fields.map { case (n, c) => c.cast("boolean").as(s"__a_$n") }: _*)
      .filter(col("__m").isNotNull)
    val aggs = Seq(
      coalesce(sum(when(col("__m"), 1L).otherwise(0L)), lit(0L))
        .as("n_match"),
      coalesce(sum(when(!col("__m"), 1L).otherwise(0L)), lit(0L))
        .as("n_nonmatch")) ++
      fields.flatMap { case (n, _) =>
        Seq(
          coalesce(sum(when(col("__m") && col(s"__a_$n"), 1L)
            .otherwise(0L)), lit(0L)).as(s"__am_$n"),
          coalesce(sum(when(!col("__m") && col(s"__a_$n"), 1L)
            .otherwise(0L)), lit(0L)).as(s"__au_$n"),
          coalesce(sum(when(col("__m") && col(s"__a_$n").isNotNull, 1L)
            .otherwise(0L)), lit(0L)).as(s"__dm_$n"),
          coalesce(sum(when(!col("__m") && col(s"__a_$n").isNotNull, 1L)
            .otherwise(0L)), lit(0L)).as(s"__du_$n"),
          coalesce(sum(when(col(s"__a_$n").isNull, 1L).otherwise(0L)),
            lit(0L)).as(s"__nn_$n"))
      }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val perField = fields.map { case (n, _) =>
      one.select(
        lit(n).as("field"), col("n_match"), col("n_nonmatch"),
        col(s"__am_$n").as("agree_m"), col(s"__au_$n").as("agree_u"),
        col(s"__dm_$n").as("n_cmp_m"), col(s"__du_$n").as("n_cmp_u"),
        col(s"__nn_$n").as("n_null_cmp"))
    }.reduce(_ unionByName _)
    def ppm(num: String, den: String): Column =
      greatest(lit(1L), least(lit(999999L),
        expr(s"($num * 1000000L) DIV $den")))
    def rawPpm(num: String, den: String): Column =
      expr(s"($num * 1000000L) DIV $den")
    def lnNano(p: Column, q: Column): Column =
      floor(log(p.cast("double") / q.cast("double")) * 1000000000L
        + 0.5).cast("long")
    perField
      .withColumn("m_ppm",
        when(col("n_cmp_m") > 0L, ppm("agree_m", "n_cmp_m")))
      .withColumn("u_ppm",
        when(col("n_cmp_u") > 0L, ppm("agree_u", "n_cmp_u")))
      .withColumn("n_clamped",
        when(col("n_cmp_m") > 0L && col("n_cmp_u") > 0L,
          when(col("m_ppm") =!= rawPpm("agree_m", "n_cmp_m"), 1L)
            .otherwise(0L) +
            when(col("u_ppm") =!= rawPpm("agree_u", "n_cmp_u"), 1L)
              .otherwise(0L)))
      .withColumn("w_agree_nano",
        when(col("m_ppm").isNotNull && col("u_ppm").isNotNull,
          lnNano(col("m_ppm"), col("u_ppm"))))
      .withColumn("w_disagree_nano",
        when(col("m_ppm").isNotNull && col("u_ppm").isNotNull,
          lnNano(lit(1000000L) - col("m_ppm"),
            lit(1000000L) - col("u_ppm"))))
      .select(col("field"), col("n_match"), col("n_nonmatch"),
        col("agree_m"), col("agree_u"), col("n_cmp_m"), col("n_cmp_u"),
        col("n_null_cmp"), col("n_clamped"), col("m_ppm"), col("u_ppm"),
        col("w_agree_nano"), col("w_disagree_nano"))
      .orderBy(col("field"))
  }
}
