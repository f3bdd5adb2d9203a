package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge into Spark's `private[sql]` surface, declared inside the
  * `org.apache.spark.sql` package so the compiler admits the access — the
  * standard pattern third-party Spark extensions (Delta, Iceberg, XSQL)
  * use to turn an analyzed [[LogicalPlan]] back into a [[DataFrame]].
  *
  * Kept to the ONE member the engine needs (plan → DataFrame); everything
  * else in graft stays on the public API.
  */
object GraftSqlBridge {

  /** Wrap an analyzer-produced logical plan as a DataFrame on `spark`.
    * The plan is re-run through `executePlan` by `Dataset.ofRows`, so
    * post-resolution niceties (timezone injection on bare `Cast`s, etc.)
    * still apply to nodes we construct by hand. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = spark match {
    case cs: classic.SparkSession => classic.Dataset.ofRows(cs, plan)
    case other =>
      throw new IllegalStateException(
        s"GraftSqlBridge requires a classic (JVM) SparkSession, got ${other.getClass.getName} " +
          "— Spark Connect sessions cannot execute server-side logical plans from the client")
  }
}
