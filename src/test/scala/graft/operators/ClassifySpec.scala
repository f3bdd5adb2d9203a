package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Integer likelihood-ratio classifier: hand-computed weights, unseen-term
  * backoff, separation on a synthetic two-class corpus, degenerate docs. */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("weights match the hand-computed ratio formula") {
    // pos corpus: "spark spark", neg corpus: "flink"
    // c(spark)=(2,0), c(flink)=(0,1); T+=2, T-=1, V=2
    val train = Seq((true, "spark spark"), (false, "flink"))
      .toDF("label", "text")
    val m = Classify.ratioModel(train, col("label"), col("text"))
      .select("term", "w_ppm").as[(String, Long)].collect().toMap
    // w(spark) = 1e6·(2+1)·(1+2) DIV ((2+2)·(0+1)) = 9e6 DIV 4 = 2250000
    assert(m("spark") == 2250000L)
    // w(flink) = 1e6·(0+1)·(1+2) DIV ((2+2)·(1+1)) = 3e6 DIV 8 = 375000
    assert(m("flink") == 375000L)
  }

  test("scores average per-token ratios; unseen terms use the w0 backoff") {
    val train = Seq((true, "spark spark"), (false, "flink"))
      .toDF("label", "text")
    val m = Classify.ratioModel(train, col("label"), col("text"))
    val test = Seq((1L, "spark"), (2L, "flink"), (3L, "unseen"),
      (4L, "spark flink")).toDF("doc_id", "text")
    val out = Classify.ratioScore(test, m)
      .orderBy("doc_id")
      .select("doc_id", "score_ppm", "pred")
      .as[(Long, Option[Long], Option[Boolean])].collect()
    assert(out(0) == ((1L, Some(2250000L), Some(true))))
    assert(out(1) == ((2L, Some(375000L), Some(false))))
    // w0 = 1e6·(1+2) DIV (2+2) = 750000 → negative-leaning neutral
    assert(out(2) == ((3L, Some(750000L), Some(false))))
    // (2250000 + 375000) DIV 2 = 1312500 → positive
    assert(out(3) == ((4L, Some(1312500L), Some(true))))
  }

  test("tokenless and null-text docs score NULL but stay in the output") {
    val train = Seq((true, "a"), (false, "b")).toDF("label", "text")
    val m = Classify.ratioModel(train, col("label"), col("text"))
    val test = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "a"))
      .toDF("doc_id", "text")
    val out = Classify.ratioScore(test, m)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "score_ppm")
      .as[(Long, Long, Option[Long])].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(out(0)._2 == 0L && out(0)._3.isEmpty)
    assert(out(1)._2 == 0L && out(1)._3.isEmpty)
    assert(out(2)._3.nonEmpty)
  }

  test("separates a synthetic two-vocabulary corpus") {
    val pos = (0 until 30).map(i => (true, s"good great fine token$i"))
    val neg = (0 until 30).map(i => (false, s"bad awful poor token$i"))
    val train = (pos ++ neg).toDF("label", "text")
    val m = Classify.ratioModel(train, col("label"), col("text"))
    val test = Seq((1L, "good great stuff"), (2L, "awful poor stuff"))
      .toDF("doc_id", "text")
    val out = Classify.ratioScore(test, m)
      .select("doc_id", "pred").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L))
  }

  test("null labels are excluded from training") {
    val train = Seq((Some(true), "spark"), (Some(false), "flink"),
      (None, "poison poison poison")).toDF("label", "text")
    val m = Classify.ratioModel(train, col("label"), col("text"))
    assert(m.filter(col("term") === "poison").count() == 0)
  }

  test("evalBinary: hand-computed confusion and ppm metrics") {
    val scored = Seq(
      (Some(true), Some(true)),   // tp
      (Some(true), Some(true)),   // tp
      (Some(true), Some(false)),  // fp
      (Some(false), Some(true)),  // fn
      (Some(false), Some(false)), // tn
      (None, Some(true)),         // null pred
      (Some(true), None)          // null truth
    ).toDF("pred", "truth")
    val r = Classify.evalBinary(scored, col("pred"), col("truth"))
      .select("tp", "fp", "tn", "fn", "n_null", "accuracy_ppm",
        "precision_ppm", "recall_ppm", "f1_ppm")
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long], Option[Long])].head()
    assert(r._1 == 2L && r._2 == 1L && r._3 == 1L && r._4 == 1L && r._5 == 2L)
    assert(r._6 == Some(600000L))  // 3/5
    assert(r._7 == Some(666666L))  // 2/3 truncated
    assert(r._8 == Some(666666L))  // 2/3
    // f1 = 2·p·r/(p+r) on the ppm values = 666666
    assert(r._9 == Some(666666L))
  }

  test("evalBinary: undefined metrics are NULL, not fake zeros") {
    // no positive predictions → precision NULL; no positive truth →
    // recall NULL; both → f1 NULL
    val allNeg = Seq((Some(false), Some(false)), (Some(false), Some(false)))
      .toDF("pred", "truth")
    val r = Classify.evalBinary(allNeg, col("pred"), col("truth"))
      .select("accuracy_ppm", "precision_ppm", "recall_ppm", "f1_ppm")
      .as[(Option[Long], Option[Long], Option[Long], Option[Long])].head()
    assert(r._1 == Some(1000000L) && r._2.isEmpty && r._3.isEmpty &&
      r._4.isEmpty)
    // empty frame: every cell 0, every metric NULL
    val e = Classify.evalBinary(allNeg.limit(0), col("pred"), col("truth"))
      .select("tp", "accuracy_ppm")
      .as[(Long, Option[Long])].head()
    assert(e._1 == 0L && e._2.isEmpty)
  }

  test("layout independence: same scores on any partitioning") {
    val train = (0 until 40).map(i =>
      (i % 3 == 0, s"w${i % 7} w${i % 5} w${i % 11}")).toDF("label", "text")
    val test = (0 until 25).map(i => (i.toLong, s"w${i % 7} w${i % 5}"))
      .toDF("doc_id", "text")
    val a = Classify.ratioScore(test,
        Classify.ratioModel(train, col("label"), col("text")))
      .orderBy("doc_id").collect().toSeq
    val b = Classify.ratioScore(test.repartition(13),
        Classify.ratioModel(train.repartition(7), col("label"), col("text")))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
