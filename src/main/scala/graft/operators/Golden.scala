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
}
