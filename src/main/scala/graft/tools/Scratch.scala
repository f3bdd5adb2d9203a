package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule

/** Throwaway experiment: how far does the analyzer take MERGE INTO on a
  * temp-view target, and can an injected resolution rule see it resolved? */
object Scratch {

  object SpyRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      plan.foreach {
        case m: MergeIntoTable =>
          // scalastyle:off println
          println(s"[spy] MergeIntoTable seen: resolved=${m.resolved} " +
            s"condResolved=${m.mergeCondition.resolved} " +
            s"matched=${m.matchedActions} notMatched=${m.notMatchedActions} " +
            s"notMatchedBySource=${m.notMatchedBySourceActions} " +
            s"schemaEvolution=${m.withSchemaEvolution}")
          println(s"[spy] target class=${m.targetTable.getClass.getName} plan:\n${m.targetTable}")
          println(s"[spy] full:\n$m")
        case _ =>
      }
      plan
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext => ext.injectResolutionRule(_ => SpyRule))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("t")
    Seq((2, "B", 99.0), (3, "c", 30.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("s")

    try {
      spark.sql(
        """MERGE INTO t USING s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin).show()
    } catch {
      case e: Throwable =>
        println(s"[scratch] MERGE failed with ${e.getClass.getName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
