package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class TextSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c).head().get(0)

  test("langId identifies real-language snippets") {
    assert(one("the cat sat on the mat and it was happy", Text.langId($"t")) === "en")
    assert(one("der Hund ist nicht mit der Katze", Text.langId($"t")) === "de")
    assert(one("le chat est dans la maison et il dort", Text.langId($"t")) === "fr")
    assert(one("el perro es grande y no come en la casa", Text.langId($"t")) === "es")
    assert(one("今天天气很好我们去公园散步吧", Text.langId($"t")) === "zh")
    assert(one("xyzzy plugh qwerty", Text.langId($"t")) === "und")
  }

  test("token counts: whitespace vs regex tokens") {
    assert(one("Hello, world! 42", Text.tokenCountWs($"t")) === 3)
    // Hello , world ! 42 → 5 regex tokens
    assert(one("Hello, world! 42", Text.tokenCountRegex($"t")) === 5L)
    assert(one("  padded   spaces  ", Text.tokenCountWs($"t")) === 2)
  }

  test("shingles: distinct word n-grams with short-doc fallback") {
    val sh = one("a b c d", Text.shingles($"t", 3)).asInstanceOf[scala.collection.Seq[String]]
    assert(sh.toSet === Set("a b c", "b c d"))
    val short = one("a b", Text.shingles($"t", 3)).asInstanceOf[scala.collection.Seq[String]]
    assert(short.toSet === Set("a", "b"))
  }

  test("simhash: near-identical texts are close in Hamming distance, unrelated far") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val near = base + " extra"
    val far  = "completely different words about database engines and query planners here"
    val df = Seq(base, near, far).toDF("t").select(Text.simhash64($"t").as("h"))
    val Seq(h1, h2, h3) = df.as[Long].collect().toSeq
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) < ham(h1, h3))
    assert(ham(h1, h2) <= 14)
  }

  test("fingerprint: whitespace-normalization invariant, content-sensitive") {
    val a = one("Hello   World", Text.fingerprint($"t"))
    val b = one("hello world", Text.fingerprint($"t"))
    val c = one("hello worlds", Text.fingerprint($"t"))
    assert(a === b)
    assert(a !== c)
  }

  test("qualityScore bounded in [0,1] and monotone-ish") {
    val long = ("the quick brown fox and it is a fine day " * 20).trim
    val q1 = one(long, Text.qualityScore($"t")).asInstanceOf[Double]
    val q2 = one("x", Text.qualityScore($"t")).asInstanceOf[Double]
    assert(q1 >= 0.0 && q1 <= 1.0 && q2 >= 0.0 && q2 <= 1.0)
    assert(q1 > q2)
  }

  test("stopwordRatio exact rational") {
    assert(one("the dog", Text.stopwordRatio($"t")) === 0.5)
    assert(one("", Text.stopwordRatio($"t")) === 0.0)
  }

  test("repetitionRatio: hand-computed duplicate 3-gram fractions") {
    // "a b c a b c a b" → 3-grams: [a b c, b c a, c a b, a b c, b c a, c a b]
    // 6 total, 3 distinct → ratio 0.5
    assert(one("a b c a b c a b", Text.repetitionRatio($"t", 3)) === 0.5)
    // all distinct grams → 0.0
    assert(one("a b c d e", Text.repetitionRatio($"t", 3)) === 0.0)
    // shorter than n words → no grams → 0.0, not null/NaN
    assert(one("a b", Text.repetitionRatio($"t", 3)) === 0.0)
    assert(one("", Text.repetitionRatio($"t", 3)) === 0.0)
    // pure repetition: "x x x x" → grams [x x x, x x x] → 1 - 1/2
    assert(one("x x x x", Text.repetitionRatio($"t", 3)) === 0.5)
  }

  test("redactPii: email, long numbers, IPs replaced; order protects octets") {
    assert(one("mail a.b+c@test.org now", Text.redactPii($"t"))
      === "mail <EMAIL> now")
    assert(one("call 12345678 ok", Text.redactPii($"t")) === "call <NUM> ok")
    // 6 digits stays (below default minDigits=7)
    assert(one("pin 123456 ok", Text.redactPii($"t")) === "pin 123456 ok")
    assert(one("host 192.168.0.1 up", Text.redactPii($"t")) === "host <IP> up")
    // IP rule must run before the digit rule or octets survive half-eaten
    assert(one("x 10.0.0.255 y 99999999 z a@b.io", Text.redactPii($"t"))
      === "x <IP> y <NUM> z <EMAIL>")
    // email digits are not re-matched by the number rule
    assert(one("u12345678@ex.com", Text.redactPii($"t")) === "<EMAIL>")
  }

  test("stripHtml: blocks, tags, entities, whitespace — in that order") {
    // script/style content (with raw < in code) is removed entirely
    assert(one("<p>hi</p><script>if (x<y) { f(); }</script><b>there</b>",
      Text.stripHtml($"t")) === "hi there")
    assert(one("a<style>p { color: red }</style>b", Text.stripHtml($"t")) === "a b")
    // tags become spaces so words don't glue across elements
    assert(one("<p>one</p><p>two</p>", Text.stripHtml($"t")) === "one two")
    // entity decode, &amp; last: literal &amp;lt; means the TEXT "&lt;"
    assert(one("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y &amp;lt;",
      Text.stripHtml($"t")) === "x <tag> \"q\" 's' & y &lt;")
    // attributes with > inside quotes are not supported (documented
    // regex skeleton); plain attributes strip fine
    assert(one("<a href=\"u\" class='c'>link</a>", Text.stripHtml($"t")) === "link")
    // whitespace collapse + trim
    assert(one("  <p>\n\ta   b\r\n</p>  ", Text.stripHtml($"t")) === "a b")
  }

  test("repetitionRatio: native expression agrees bitwise with the HOF reference") {
    val texts = Seq(
      "a b c a b c a b", "x x x x", "a b", "", "one two three four five",
      "the the the cat cat the the the", "  padded   runs\tand\ttabs  x y z x y z")
    val df = texts.toDF("t")
    val rows = df.select(
      Text.repetitionRatio($"t", 3).as("ref"),
      graft.plans.TextExprs.repetitionRatio(spark, $"t", 3).as("native")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("charEntropy: native kernel agrees bitwise with the Scala reference") {
    val texts = Seq(
      "", "a", "aaaa", "ab", "abab", "hello world", "the quick brown fox",
      "zzzzzzzzzzzzzzzzzzzy", "0123456789 9876543210  mixed\tws\nlines")
    val rows = texts.toDF("t").select(
      graft.plans.TextExprs.charEntropy(spark, $"t").as("ce"), $"t").collect()
    rows.foreach { r =>
      val s = r.getString(1)
      val (n, d, h) = Text.charEntropyRef(s)
      val ce = r.getStruct(0)
      assert(ce.getInt(0) === n, s"n_chars for '$s'")
      assert(ce.getInt(1) === d, s"distinct for '$s'")
      assert(java.lang.Double.doubleToLongBits(ce.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(h), s"entropy bits for '$s'")
    }
  }

  test("charEntropy: hand-checked values and bounds") {
    def h(s: String): Double = Text.charEntropyRef(s)._3
    assert(h("") === 0.0)
    assert(h("aaaa") === 0.0)
    assert(math.abs(h("ab") - 1.0) < 1e-12)          // two equiprobable chars
    assert(math.abs(h("aabb") - 1.0) < 1e-12)
    assert(math.abs(h("abcd") - 2.0) < 1e-12)        // four equiprobable
    val natural = h("the quick brown fox jumps over the lazy dog")
    assert(natural > 3.0 && natural < 5.0)
    // upper bound: log2(distinct)
    val (_, d, e) = Text.charEntropyRef("abcabcabd")
    assert(e <= math.log(d.toDouble) / math.log(2.0) + 1e-12)
  }

  test("cdcChunks: native agrees with reference; lossless; bounds hold") {
    val rnd = new scala.util.Random(7)
    val texts = Seq("", "short", "x" * 300,
      (1 to 600).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString,
      (1 to 2000).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val rows = texts.toDF("t").select(
      graft.plans.TextExprs.cdcChunks(spark, $"t", 32, 64, 256).as("ch"), $"t")
      .collect()
    rows.foreach { r =>
      val s = r.getString(1)
      val native = r.getSeq[String](0)
      val mask = java.lang.Long.highestOneBit(32L) - 1L // avg-min = 32
      assert(native === Text.cdcChunksRef(s, 32, mask, 256), s"len ${s.length}")
      assert(native.mkString("") === s)
      assert(native.forall(_.length <= 256))
      assert(native.dropRight(1).forall(_.length >= 32))
    }
  }

  test("cdcChunks: boundaries re-synchronize after a prefix edit") {
    val rnd = new scala.util.Random(11)
    val s = (1 to 3000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val mask = 31L
    val base = Text.cdcChunksRef(s, 32, mask, 256)
    val edited = Text.cdcChunksRef("INSERTED-PREFIX " + s, 32, mask, 256)
    // all chunks after re-sync are byte-identical — the content-defined
    // property fixed-stride chunking lacks
    val shared = base.reverse.zip(edited.reverse).takeWhile { case (a, b) => a == b }
    assert(shared.length >= base.length - 3,
      s"only ${shared.length} of ${base.length} chunks survived the edit")
  }

  test("ngramList keeps duplicates, shingles dedups") {
    val g = one("a b c a b c a b", Text.ngramList($"t", 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(g.length === 6)
    assert(g.count(_ == "a b c") === 2)
    val s = one("a b c a b c a b", Text.shingles($"t", 3))
      .asInstanceOf[scala.collection.Seq[String]]
    assert(s.length === 3)
  }
}
