package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Integer PageRank: hand-computed recurrence, symmetry, determinism. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pagerankMicro(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration matches the hand-computed integer recurrence") {
    // directed triangle 1→2→3→1, all outdeg 1:
    // contrib = 1000000 DIV 1; rank' = 150000 + 85*1000000 DIV 100 = 1000000
    val tri = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 1)
    assert(tri === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))

    // star 1→2, 1→3 (outdeg 2), 2→1, 3→1 (outdeg 1):
    // hub 1 receives 1000000+1000000 → 150000 + 85*2000000 DIV 100 = 1850000
    // leaves receive 1000000 DIV 2 = 500000 → 150000 + 85*500000 DIV 100 = 575000
    val star = ranksOf(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), 1)
    assert(star === Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
  }

  test("symmetric vertices get identical ranks after several iterations") {
    val star = ranksOf(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)), 5)
    assert(star(2L) === star(3L))
    assert(star(1L) > star(2L))
  }

  test("duplicate edges collapse; results are layout-independent") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val a = ranksOf(e, 3)
    val b = Graph.pagerankMicro(e.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    val dedup = ranksOf(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)), 3)
    assert(a === dedup)
  }

  test("directed chain keeps source-only and sink-only vertices alive") {
    // 1→2→3: node 1 has no in-links (settles at base), node 3 no out-links
    val out = ranksOf(Seq((1L, 2L), (2L, 3L)), 3)
    assert(out.keySet === Set(1L, 2L, 3L))
    // r1: 1→150000, 2→1000000, 3→1000000
    // r2: 2→150000+85%·150000=277500, 3→150000+85%·1000000=1000000
    // r3: 2→277500, 3→150000+(85·277500)//100=385875
    assert(out === Map(1L -> 150000L, 2L -> 277500L, 3L -> 385875L))
  }

  test("truncating division only ever loses mass (total ≤ ideal)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 2L), (2L, 1L))
    val total = ranksOf(e, 4).values.sum
    assert(total <= 3L * 1000000L)
    assert(total > 3L * 900000L) // leak is tiny, not structural
  }
}
