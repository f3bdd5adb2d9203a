package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule

/** Test-scope analyzer probe (NOT shipped): what state does a
  * MergeIntoTable over temp-view target/source reach in Spark 4.1's
  * analyzer, and do star actions get expanded, before any check rejects
  * it? Informs the interception point for graft's SQL MERGE lowering. */
object MergeProbeMain {

  final class Spy(tag: String) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      plan.foreach {
        case m: MergeIntoTable =>
          println(s"[$tag] resolved=${m.resolved} cond=${m.mergeCondition.resolved}")
          println(s"[$tag] matched=${m.matchedActions.map(_.getClass.getSimpleName)} " +
            s"notMatched=${m.notMatchedActions.map(_.getClass.getSimpleName)} " +
            s"bySource=${m.notMatchedBySourceActions.map(_.getClass.getSimpleName)}")
          println(s"[$tag] matchedFull=${m.matchedActions}")
          println(s"[$tag] notMatchedFull=${m.notMatchedActions}")
          println(s"[$tag] target=${m.targetTable.getClass.getSimpleName}:\n${m.targetTable.treeString.linesIterator.take(4).mkString("\n")}")
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
      .withExtensions { ext =>
        ext.injectResolutionRule(_ => new Spy("res"))
        ext.injectPostHocResolutionRule(_ => new Spy("posthoc"))
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Seq((1, "a", 10.0), (2, "b", 20.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("t")
    Seq((2, "B", 99.0), (3, "c", 30.0)).toDF("k", "name", "v")
      .createOrReplaceTempView("s")

    def attempt(label: String, sql: String): Unit = {
      println(s"===== $label =====")
      try spark.sql(sql).show()
      catch {
        case e: Throwable =>
          println(s"[$label] FAILED ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
      }
    }

    attempt("star",
      """MERGE INTO t USING s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    attempt("explicit",
      """MERGE INTO t USING s ON t.k = s.k
        |WHEN MATCHED AND s.v > 50 THEN UPDATE SET name = s.name, v = s.v + 1
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED THEN INSERT (k, name, v) VALUES (s.k, s.name, s.v)
        |WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE""".stripMargin)

    spark.stop()
  }
}
