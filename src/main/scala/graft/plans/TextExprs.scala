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

  private def eachToken(text: UTF8String)(f: String => Unit): Unit = {
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
  def repetitionRatio(spark: org.apache.spark.sql.SparkSession, c: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_repetition", c, org.apache.spark.sql.functions.lit(n))
  }
}
