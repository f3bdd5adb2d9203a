package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis kernels as native expressions. Semantics are identical to
  * the HOF reference implementations in graft.functions.Text (tokens =
  * lowercased whitespace-split non-empty strings); these exist because the
  * HOF path evaluates interpreted, which dominates per-document cost at
  * corpus scale.
  */
object TextImpl {

  private[plans] def eachToken(text: UTF8String)(f: String => Unit): Unit = {
    val s = text.toLowerCase.toString
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || HashImpl.isRegexSpace(s.charAt(i))) {
        if (i > start) f(s.substring(start, i))
        start = i + 1
      }
      i += 1
    }
  }

  /** The canonical-key tail of `TextDedup.canonicalText` as ONE pass,
    * exactly equivalent (for EVERY input, asserted bitwise in specs) to
    * `trim(regexp_replace(regexp_replace(s, "[^a-z0-9\\s]", " "), "\\s+", " "))`:
    * the first regex turns each non-alnum non-whitespace char into a
    * space, the second collapses whitespace runs, trim drops the edges —
    * i.e. the composition emits the [a-z0-9] runs joined by single
    * spaces, which is what this loop does directly (a supplementary
    * code point is two non-alnum chars here vs one for the regex; both
    * collapse into the same single separator). Replaces two compiled-
    * regex scans with one branch-per-char pass. */
  def alnumFold(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** (n_words, sum of word lengths). */
  def tokenStats(text: UTF8String): InternalRow = {
    var n = 0
    var sum = 0L
    eachToken(text) { w => n += 1; sum += w.length }
    new GenericInternalRow(Array[Any](n, sum))
  }

  /** (stopword hits, n_words). */
  def stopwordStats(text: UTF8String, set: java.util.HashSet[String]): InternalRow = {
    var n = 0
    var hits = 0
    eachToken(text) { w => n += 1; if (set.contains(w)) hits += 1 }
    new GenericInternalRow(Array[Any](hits, n))
  }

  /** Language-ID identical to Text.langId: CJK-ratio rule first, then
    * stopword-profile occurrence argmax with lexicographic-largest tie
    * break, 'und' when all scores are zero. */
  def langId(text: UTF8String,
             profiles: Array[(String, java.util.HashSet[String])]): UTF8String = {
    val s = text.toString
    var cjk = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      i += 1
    }
    if (cjk * 3 > s.length) return UTF8String.fromString("zh")
    val scores = new Array[Int](profiles.length)
    eachToken(text) { w =>
      var p = 0
      while (p < profiles.length) {
        if (profiles(p)._2.contains(w)) scores(p) += 1
        p += 1
      }
    }
    // argmax, ties → lexicographically larger code (profiles sorted asc)
    var best = 0
    var p = 1
    while (p < profiles.length) {
      if (scores(p) >= scores(best)) best = p
      p += 1
    }
    if (scores(best) > 0) UTF8String.fromString(profiles(best)._1)
    else UTF8String.fromString("und")
  }

  /** Within-document repetition ratio, semantics identical to the HOF
    * reference graft.functions.Text.repetitionRatio (which the spec
    * cross-checks bitwise): 1 − distinct/total over the document's word
    * n-grams with duplicates kept; 0.0 when the document has fewer than
    * n words. One pass to tokenize, one windowed pass to hash grams —
    * no intermediate arrays of grams survive the loop. */
  def repetitionRatio(text: UTF8String, n: Int): Double = {
    val toks = new java.util.ArrayList[String]()
    eachToken(text)(t => { toks.add(t); () })
    val total = toks.size - (n - 1)
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    var distinct = 0
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    1.0 - distinct.toDouble / total
  }

  /** 64-bit rolling-hash fingerprint, semantics identical to the UDF
    * reference graft.functions.Text.fingerprint: lowercase, trim, collapse
    * `\s+` runs to one space, then Karp-Rabin base-31 with silent 64-bit
    * wraparound. The normalization is fused into the hash loop — no
    * intermediate string is allocated. */
  def fingerprint64(text: UTF8String): Long = {
    val s = text.toString.toLowerCase.trim
    var h = 0L
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (HashImpl.isRegexSpace(c)) pendingSpace = true
      else {
        if (pendingSpace) { h = h * 31L + ' '.toLong; pendingSpace = false }
        h = h * 31L + c.toLong
      }
      i += 1
    }
    h
  }

  /** (n_chars, distinct_chars, entropy): Shannon entropy in bits over
    * the document's UTF-16 code units (== codepoints for BMP text) —
    * the classic cheap gibberish/boilerplate signal (natural prose sits
    * near 4–4.5 bits; single-char spam at 0; random base64 near 6).
    * Semantics mirrored bitwise by the reference
    * graft.functions.Text.charEntropyRef (spec cross-checks): counts
    * accumulate in a map, then the log-sum runs over chars in ASCENDING
    * CHAR ORDER — a fixed summation order, so the double result is a
    * pure function of the string, independent of layout or hash-map
    * iteration accidents. H = log2(n) − (Σ c·ln c)/(n·ln 2). */
  def charEntropy(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericInternalRow(Array[Any](0, 0, 0.0))
    val freq = new java.util.HashMap[Character, Array[Int]]()
    var i = 0
    while (i < n) {
      val c = Character.valueOf(s.charAt(i))
      val cell = freq.get(c)
      if (cell == null) freq.put(c, Array(1)) else cell(0) += 1
      i += 1
    }
    val chars = new Array[Char](freq.size)
    val it = freq.keySet().iterator()
    var m = 0
    while (it.hasNext) { chars(m) = it.next().charValue(); m += 1 }
    java.util.Arrays.sort(chars)
    var sum = 0.0
    var j = 0
    while (j < m) {
      val c = freq.get(Character.valueOf(chars(j)))(0).toDouble
      sum += c * Math.log(c)
      j += 1
    }
    val h = (Math.log(n.toDouble) - sum / n) / Math.log(2.0)
    new GenericInternalRow(Array[Any](n, m, h))
  }

  /** splitmix64-derived gear table for content-defined chunking —
    * deterministic, no RNG state. */
  private[plans] val gear: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var z = (i + 1).toLong * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      t(i) = z ^ (z >>> 31)
      i += 1
    }
    t
  }

  /** Content-defined chunking (gear rolling hash): split the string
    * where `(h & mask) == 0` once the chunk has `minLen` chars, force a
    * split at `maxLen`. The gear recurrence `h = (h << 1) + gear(c)`
    * forgets input older than ~64 chars (the shift drains old bits),
    * which is the content-defined property: after an insertion, chunk
    * boundaries RE-SYNCHRONIZE within one window, so all later chunks
    * — and their dedup hashes — are unchanged. Fixed-stride chunking
    * (q36) loses alignment forever on a one-char edit; this is the
    * chunker a cross-snapshot passage dedup wants. The hash resets at
    * each boundary (FastCDC convention), keeping chunks independent. */
  def cdcChunks(text: UTF8String, minLen: Int, mask: Long,
                maxLen: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(s.charAt(i) & 0xff)
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out.add(UTF8String.fromString(s.substring(start, i + 1)))
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out.add(UTF8String.fromString(s.substring(start, n)))
    new GenericArrayData(out.toArray)
  }

  /** Unicode NFC normalization (canonical composition): é as e+◌́
    * composes to the single codepoint — the canonicalization that makes
    * hash-based dedup see byte-different, render-identical text as
    * equal. Returns the input object unchanged (no copy) when already
    * in NFC — the common case for western corpora, and Normalizer
    * detects it in one scan. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Accent folding: NFD decomposition, then drop combining marks
    * (Unicode category Mn) — é→e, ü→u, ñ→n. Precomposed letters that
    * are NOT letter+mark decompositions (ø, ß, đ) pass through, the
    * same contract as utf8proc-based engines (DuckDB `strip_accents`),
    * which makes the kernel cross-engine oracle-able. */
  def stripAccents(text: UTF8String): UTF8String = {
    val s = text.toString
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK) hasMark = true
      i += 1
    }
    if (!hasMark) { if (d == s) text else UTF8String.fromString(d) }
    else {
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(sb.toString)
    }
  }
}

object BpeImpl {
  /** BPE token count over the document: per lowercased whitespace word,
    * repeatedly fuse the lowest-rank adjacent pair (all non-overlapping
    * occurrences, left-to-right) until none is in the table. Imperative
    * mirror of the HOF reference graft.operators.Bpe (which the spec and
    * the q79 agreement audit cross-check bitwise). Ranks are keyed
    * "a\u0000b" — NUL can't appear inside a symbol built from non-NUL
    * text. */
  def countTokens(text: UTF8String, ranks: java.util.HashMap[String, Integer]): Int = {
    var total = 0
    TextImpl.eachToken(text) { w =>
      if (w.length <= 1) total += 1
      else {
        var syms = new java.util.ArrayList[String](w.length)
        var i = 0
        while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
        var done = false
        while (!done && syms.size > 1) {
          var bestRank = Int.MaxValue
          var bestA: String = null
          var bestB: String = null
          var j = 0
          while (j < syms.size - 1) {
            val r = ranks.get(syms.get(j) + "\u0000" + syms.get(j + 1))
            if (r != null && r < bestRank) {
              bestRank = r; bestA = syms.get(j); bestB = syms.get(j + 1)
            }
            j += 1
          }
          if (bestA == null) done = true
          else {
            val fused = new java.util.ArrayList[String](syms.size)
            var k = 0
            while (k < syms.size) {
              if (k < syms.size - 1 && syms.get(k) == bestA && syms.get(k + 1) == bestB) {
                fused.add(bestA + bestB); k += 2
              } else { fused.add(syms.get(k)); k += 1 }
            }
            syms = fused
          }
        }
        total += syms.size
      }
    }
    total
  }
}

case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0000" + b, i) }
    m
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    BpeImpl.countTokens(v.asInstanceOf[UTF8String], ranks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeImpl.countTokens($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextImpl.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextImpl.stripAccents(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.stripAccents($c)")
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(c)
}

case class AlnumFold(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextImpl.alnumFold(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.alnumFold($c)")
  override protected def withNewChildInternal(c: Expression): AlnumFold = copy(c)
}

case class TokenStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextImpl.tokenStats(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.tokenStats($c)")
  override protected def withNewChildInternal(c: Expression): TokenStats = copy(c)
}

case class StopwordStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(w => s.add(w.toLowerCase))
    s
  }
  override def dataType: DataType = StructType(Seq(
    StructField("hits", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextImpl.stopwordStats(v.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.stopwordStats($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): StopwordStats = copy(child = c)
}

case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {
  @transient private lazy val compiled: Array[(String, java.util.HashSet[String])] =
    profiles.sortBy(_._1).map { case (code, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(w => s.add(w.toLowerCase))
      (code, s)
    }.toArray
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextImpl.langId(v.asInstanceOf[UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langProfiles", compiled,
      "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.langId($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(child = c)
}

/** Fingerprint64: the codegen fast path for Text.fingerprint (whose UDF
  * stays as the independent reference the q31 self-oracle compares
  * against). */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextImpl.fingerprint64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.fingerprint64($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(c)
}

/** RepetitionRatio: the codegen fast path for Text.repetitionRatio
  * (whose HOF formulation stays as the independent reference the spec
  * compares against — the HOF path is interpreted and re-evaluates its
  * gram list per reference, ~50× slower at corpus scale). */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextImpl.charEntropy(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.charEntropy($c)")
  override protected def withNewChildInternal(c: Expression): CharEntropy = copy(c)
}

case class CdcChunks(child: Expression, minLen: Int, mask: Long, maxLen: Int)
    extends UnaryExpression {
  require(minLen >= 1 && maxLen >= minLen && mask >= 0,
    s"need 1 <= minLen <= maxLen and mask >= 0; got ($minLen, $maxLen, $mask)")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextImpl.cdcChunks(v.asInstanceOf[UTF8String], minLen, mask, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.TextImpl.cdcChunks($c, $minLen, ${mask}L, $maxLen)")
  override protected def withNewChildInternal(c: Expression): CdcChunks = copy(child = c)
}

case class RepetitionRatio(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TextImpl.repetitionRatio(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextImpl.repetitionRatio($c, $n)")
  override protected def withNewChildInternal(c: Expression): RepetitionRatio = copy(child = c)
}

object TextExprs {
  import graft.functions.Text

  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering per call floods logs with
    // "SimpleFunctionRegistry ... replaced a previously registered
    // function" warnings (one per query in a bench run). The guard must
    // check EVERY name this method registers — GraftExtensions injects
    // an overlapping set at session build, and a single-name guard
    // would short-circuit on that overlap and leave the rest missing.
    val names = Seq("graft_token_stats", "graft_repetition",
      "graft_stopword_stats", "graft_lang_id", "graft_fingerprint",
      "graft_char_entropy", "graft_nfc", "graft_strip_accents",
      "graft_alnum_fold")
    if (names.forall(n => reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)))) return
    reg.createOrReplaceTempFunction("graft_token_stats",
      exprs => TokenStats(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_repetition",
      exprs => RepetitionRatio(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_stopword_stats",
      exprs => StopwordStats(exprs.head, Text.englishStopwords), "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id",
      exprs => LangIdExpr(exprs.head, Text.langProfiles.toSeq), "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint",
      exprs => Fingerprint64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_char_entropy",
      exprs => CharEntropy(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_strip_accents",
      exprs => StripAccents(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_alnum_fold",
      exprs => AlnumFold(exprs.head), "built-in")
  }

  def tokenStats(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_token_stats", c)
  }
  def stopwordStats(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_stopword_stats", c)
  }
  def langId(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_lang_id", c)
  }
  def fingerprint(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_fingerprint", c)
  }
  def charEntropy(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_char_entropy", c)
  }
  def nfc(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_nfc", c)
  }
  def stripAccents(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_strip_accents", c)
  }
  def alnumFold(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    ensureRegistered(spark); call_function("graft_alnum_fold", c)
  }

  /** CDC chunker (parameter-derived registration name, same scheme as
    * bpeCount). `avgLen` picks the boundary mask: the largest power of
    * two ≤ avgLen−minLen, so expected chunk ≈ minLen + that. */
  def cdcChunks(spark: org.apache.spark.sql.SparkSession, c: Column,
                minLen: Int, avgLen: Int, maxLen: Int): Column = {
    require(avgLen > minLen, s"need avgLen > minLen, got ($minLen, $avgLen)")
    val mask = java.lang.Long.highestOneBit((avgLen - minLen).toLong) - 1L
    val name = s"graft_cdc_${minLen}_${mask}_$maxLen"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => CdcChunks(exprs.head, minLen, mask, maxLen), "built-in")
    call_function(name, c)
  }
  def repetitionRatio(spark: org.apache.spark.sql.SparkSession, c: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_repetition", c, org.apache.spark.sql.functions.lit(n))
  }

  /** BPE token count against a trained merge table (model-derived
    * registration name, same scheme as the IVF/PQ expressions). */
  def bpeCount(spark: org.apache.spark.sql.SparkSession, c: Column,
               merges: Seq[(String, String)]): Column = {
    val name = "graft_bpe_count_" + (merges.hashCode() & 0xffffffffL).toHexString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BpeCount(exprs.head, merges), "built-in")
    call_function(name, c)
  }
}
