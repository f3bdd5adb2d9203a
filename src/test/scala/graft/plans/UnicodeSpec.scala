package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Unicode NFC + accent folding kernels: golden cases, idempotence,
  * pass-through contract for non-mark precomposed letters, null
  * propagation, and SQL-surface registration. All non-ASCII test data
  * is spelled in \uXXXX escapes so the source file's own encoding can
  * never change what the test asserts. */
class UnicodeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // decomposed: e + COMBINING ACUTE, i + COMBINING DIAERESIS
  private val decomposed = "Cafe\u0301 nai\u0308ve"
  // composed: U+00E9 (é), U+00EF (ï)
  private val composed = "Caf\u00e9 na\u00efve"

  private def one(s: String): (String, String) = {
    val df = Seq(Tuple1(s)).toDF("t")
    df.select(TextExprs.nfc(spark, col("t")).as("n"),
        TextExprs.stripAccents(spark, TextExprs.nfc(spark, col("t"))).as("f"))
      .as[(String, String)].head()
  }

  test("NFC composes decomposed sequences; folding strips the accents") {
    val (n, f) = one(decomposed)
    assert(n == composed)
    assert(n.length == decomposed.length - 2)
    assert(f == "Cafe naive")
  }

  test("already-NFC ASCII passes through unchanged; NFC is idempotent") {
    val (n, f) = one("plain ascii text")
    assert(n == "plain ascii text" && f == "plain ascii text")
    val (n2, _) = one(composed)
    assert(n2 == composed)
  }

  test("precomposed letters without mark decompositions pass folding") {
    // the utf8proc-compatible contract: ø ß đ Æ are NOT letter+mark
    val s = "\u00f8 \u00df \u0111 \u00c6"
    assert(one(s)._2 == s)
  }

  test("folding handles composed and decomposed input identically") {
    val fromComposed = one("\u00e9\u00e0\u00fc\u00f1")._2
    val fromDecomposed = one("e\u0301a\u0300u\u0308n\u0303")._2
    assert(fromComposed == "eaun" && fromDecomposed == "eaun")
  }

  test("null propagates; empty string survives") {
    val df = Seq[Option[String]](None, Some("")).toDF("t")
    val out = df.select(TextExprs.nfc(spark, col("t"))).as[Option[String]]
      .collect().toSeq
    assert(out == Seq(None, Some("")))
  }

  test("SQL surface: graft_nfc / graft_strip_accents registered") {
    TextExprs.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_strip_accents(graft_nfc('nai\u0308ve')) AS f")
      .as[String].head()
    assert(r == "naive")
  }
}
