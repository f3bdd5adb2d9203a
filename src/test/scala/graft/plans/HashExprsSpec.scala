package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark
import graft.sources.Tables
import graft.functions.{Text, Vectors}

/** The native expressions must agree with their HOF reference
  * implementations — the HOF versions define the semantics, the
  * expressions are the fast path. */
class HashExprsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("ShinglesN == Text.shingles on the corpus") {
    val docs = Tables.documents(spark, SharedSpark.sf0001).limit(100)
    val cmp = docs.select(
      array_sort(HashExprs.shingles(spark, col("text"), 3)).as("fast"),
      array_sort(Text.shingles(col("text"), 3)).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("CosineSim == Vectors.cosine bitwise on the corpus") {
    val emb = Tables.embeddings(spark, SharedSpark.sf0001).limit(100)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b")).limit(500)
    val cmp = pairs.select(
      HashExprs.cosine(spark, col("va"), col("vb")).as("fast"),
      Vectors.cosine(col("va"), col("vb")).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("SrpBucket == Vectors.hyperplaneBucket bitwise") {
    val emb = Tables.embeddings(spark, SharedSpark.sf0001)
    val cmp = emb.select(
      HashExprs.srpBucket(spark, col("embedding"), 6, 64).as("fast"),
      Vectors.hyperplaneBucket(col("embedding"), 6, 64).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("SimHash62 locality: near texts close, far texts far") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base + " extra"
    val far  = "completely different words about database engines and query planners here"
    val hs = Seq(base, near, far).toDF("t")
      .select(HashExprs.simhash62(spark, $"t")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) < ham(hs(0), hs(2)))
  }

  test("SimHash62 == Text.simhash62Ref bitwise on the corpus (q29 self-oracle)") {
    val docs = Tables.documents(spark, SharedSpark.sf0001)
    val cmp = docs.select(
      HashExprs.simhash62(spark, col("text")).as("fast"),
      Text.simhash62Ref(col("text")).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("Fingerprint64 == Text.fingerprint bitwise on the corpus (q31 self-oracle)") {
    val docs = Tables.documents(spark, SharedSpark.sf0001)
    val cmp = docs.select(
      TextExprs.fingerprint(spark, col("text")).as("fast"),
      Text.fingerprint(col("text")).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
    // the normalization must actually collapse whitespace: these agree
    val hs = Seq("a  b", "a b", " a b ", "A\tB").toDF("t")
      .select(TextExprs.fingerprint(spark, $"t")).as[Long].collect()
    assert(hs.distinct.length === 1)
  }

  test("LangIdExpr == Text.langId on the corpus (q33 self-oracle)") {
    val docs = Tables.documents(spark, SharedSpark.sf0001)
    val cmp = docs.select(
      TextExprs.langId(spark, col("text")).as("fast"),
      Text.langId(col("text")).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }

  test("MinHashSig: k values, identical texts identical, estimates Jaccard") {
    val df = Seq("a b c d e f g h", "a b c d e f g h", "z y x w v u t s").toDF("t")
      .select(HashExprs.minhashSig(spark, HashExprs.shingles(spark, $"t", 3), 48).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs.forall(_.length === 48))
    assert(sigs(0) === sigs(1))
    // disjoint shingle sets → signatures agree only by chance (~0)
    val agree = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(agree <= 2)
  }

  test("HashedShinglesN == hash64(ShinglesN) bitwise — no string path divergence") {
    val docs = Tables.documents(spark, SharedSpark.sf0001).limit(200)
      .unionByName(Seq(
        (900001L, "a b"),           // < n words: per-word fallback
        (900002L, ""),              // empty → empty array
        (900003L, "  x \t y\n z ")) // regex-space runs
        .toDF("doc_id", "text"), allowMissingColumns = true)
    val hashRef = udf((ss: Seq[String]) => ss.map(s =>
      HashImpl.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 0L)))
    val cmp = docs.select(
      array_sort(HashExprs.hashedShingles(spark, col("text"), 3)).as("fast"),
      array_sort(hashRef(HashExprs.shingles(spark, col("text"), 3))).as("ref"))
    assert(cmp.filter(col("fast") =!= col("ref")).count() === 0)
  }
}
