package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** DeflateLen / LuhnValid kernels: known-answer Luhn vectors, deflate
  * determinism + compressibility ordering, null handling, SQL surface. */
class SignalExprsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("luhnValid: known-answer test vectors") {
    // 79927398713 is the canonical Luhn example; the others are
    // published test card numbers (Visa/MC/Amex format samples)
    val valid = Seq("79927398713", "4111111111111111",
      "5500005555555559", "378282246310005", "0000000000000000")
    val invalid = Seq("79927398710", "4111111111111112",
      "1234567812345678", "1", "", "4111-1111-1111-1111", "abc",
      "411111111111111a")
    val rows = (valid.map((_, true)) ++ invalid.map((_, false)))
      .toDF("s", "expect")
    val got = rows.select(col("expect"),
        SignalExprs.luhnValid(spark, col("s")).as("got"))
      .collect()
    got.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
    // NULL in → NULL out (not false)
    val n = Seq[Option[String]](None).toDF("s")
      .select(SignalExprs.luhnValid(spark, col("s"))).collect().head
    assert(n.isNullAt(0))
  }

  test("deflateLen: deterministic, layout-proof, orders by compressibility") {
    val rep = "the the the the the the the the the the " * 50
    val eng = "a quick brown fox jumps over the lazy dog near banks " * 38
    // high-entropy text: hex expansion of a seeded PRNG walk
    val rnd = {
      val r = new scala.util.Random(42)
      (1 to 250).map(_ => java.lang.Long.toHexString(r.nextLong())).mkString
    }
    val df = Seq(("rep", rep), ("eng", eng), ("rnd", rnd)).toDF("k", "t")
    def run(d: org.apache.spark.sql.DataFrame) = d
      .select(col("k"), SignalExprs.deflateLen(spark, col("t")).as("n"),
        octet_length(col("t")).as("len"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2)))).toMap
    val a = run(df)
    assert(a === run(df.repartition(5)))       // pure per-row function
    assert(a === run(df))                       // Deflater reset: stable
    def ratio(k: String) = a(k)._1.toDouble / a(k)._2
    assert(ratio("rep") < ratio("eng"), "repetition compresses best")
    assert(ratio("eng") < ratio("rnd"), "entropy resists compression")
    assert(ratio("rnd") <= 1.1, "deflate overhead bounded")
    assert(a.values.forall(_._1 > 0))
  }

  test("deflateLen: doubling repetitive text adds almost nothing") {
    val base = "some perfectly ordinary sentence with enough length " * 20
    val df = Seq((base, base + base)).toDF("one", "two")
    val r = df.select(
      SignalExprs.deflateLen(spark, col("one")),
      SignalExprs.deflateLen(spark, col("two"))).collect().head
    // the duplicated half is one long back-reference
    assert(r.getInt(1) < r.getInt(0) + 64)
  }

  test("SQL surface: graft_deflate_len / graft_luhn registered") {
    SignalExprs.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT graft_deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa', 6) AS d, " +
        "graft_luhn('79927398713') AS l").collect().head
    assert(r.getInt(0) > 0 && r.getBoolean(1))
  }
}
