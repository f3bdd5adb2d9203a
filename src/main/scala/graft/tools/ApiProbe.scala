package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

object ApiProbe {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

class CmdProbe extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override def run(sparkSession: org.apache.spark.sql.classic.SparkSession): Seq[org.apache.spark.sql.Row] = Seq.empty
}
