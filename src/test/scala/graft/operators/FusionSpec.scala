package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** RRF fusion: hand-computed contributions, tie rules, topK, and
  * independence from input-list row order. */
class FusionSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def nano(rank: Long, k: Long = 60L): Long = 1000000000L / (k + rank)

  test("rrf: hand-computed two-list fusion with tie-breaks") {
    // query "q": list A ranks (1,2,3) = docs (10,20,30); list B reverses
    val a = Seq(("q", 10L, 3.0), ("q", 20L, 2.0), ("q", 30L, 1.0))
      .toDF("grp", "id", "score")
    val b = Seq(("q", 30L, 9.0), ("q", 20L, 8.0), ("q", 10L, 7.0))
      .toDF("grp", "id", "score")
    val out = Fusion.rrf(Seq(a, b), Seq("grp"), "id", "score")
      .orderBy("fused_rank")
      .select("id", "n_lists", "rrf_nano", "fused_rank")
      .as[(Long, Long, Long, Long)].collect()

    // doc10: ranks 1,3 → 1e9/61 + 1e9/63; doc20: 2,2; doc30: 3,1
    val s10 = nano(1) + nano(3)
    val s20 = nano(2) + nano(2)
    val s30 = nano(3) + nano(1)
    assert(s10 == s30 && s10 > s20) // symmetric lists tie at the edges
    // fused tie (10 vs 30) breaks to the lower id
    assert(out.toSeq == Seq((10L, 2L, s10, 1L), (30L, 2L, s30, 2L),
      (20L, 2L, s20, 3L)))
  }

  test("rrf: in-list score ties break by ascending id") {
    val a = Seq(("q", 5L, 1.0), ("q", 3L, 1.0)).toDF("grp", "id", "score")
    val out = Fusion.rrf(Seq(a), Seq("grp"), "id", "score")
      .orderBy("fused_rank").select("id").as[Long].collect()
    assert(out.toSeq == Seq(3L, 5L)) // id 3 gets rank 1 → higher contrib
  }

  test("rrf: docs missing from one list still fuse; topK truncates") {
    val a = Seq(("q", 1L, 9.0), ("q", 2L, 8.0), ("q", 3L, 7.0))
      .toDF("grp", "id", "score")
    val b = Seq(("q", 2L, 5.0)).toDF("grp", "id", "score")
    val full = Fusion.rrf(Seq(a, b), Seq("grp"), "id", "score")
    val m = full.select("id", "n_lists", "rrf_nano")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(m(1L) == (1L, nano(1)))
    assert(m(2L) == (2L, nano(2) + nano(1))) // present in both
    assert(m(3L) == (1L, nano(3)))
    assert(Fusion.rrf(Seq(a, b), Seq("grp"), "id", "score", topK = 1)
      .count() == 1L)
  }

  test("rrf: result independent of input row order and partitioning") {
    val rows = (1L to 40L).map(i => ("g" + (i % 3), i, (i * 37 % 11).toDouble))
    val l1 = rows.toDF("grp", "id", "score")
    val l2 = rows.reverse.toDF("grp", "id", "score").repartition(7)
    val r1 = Fusion.rrf(Seq(l1, l1), Seq("grp"), "id", "score")
      .orderBy("grp", "fused_rank").collect()
    val r2 = Fusion.rrf(Seq(l2, l2), Seq("grp"), "id", "score")
      .orderBy("grp", "fused_rank").collect()
    assert(r1.toSeq == r2.toSeq)
  }
}
