package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row QUALITY-SIGNAL kernels as native expressions (the TextExprs
  * registration scheme): deflate length (the Gopher/C4-style
  * compression-ratio filter signal) and Luhn checksum validity (the PII
  * scan's card-number confirmer). Both are pure functions of the input
  * row — layout-proof by construction — and run as static-call codegen
  * inside whole-stage codegen.
  */
object CompressImpl {

  // one Deflater per (thread, level), reset between rows: Deflater is a
  // native resource whose per-row construction would dominate the kernel
  @transient private lazy val deflaters =
    new ThreadLocal[java.util.HashMap[Integer, java.util.zip.Deflater]] {
      override def initialValue() =
        new java.util.HashMap[Integer, java.util.zip.Deflater]()
    }

  /** Deflate (RFC 1951, raw stream, fixed level) byte length of the
    * UTF-8 text. Deterministic for a fixed input + level: `reset()`
    * clears all stream state, so output bytes are a pure function of
    * the input. */
  def deflateLen(text: UTF8String, level: Int): Int = {
    val m = deflaters.get()
    var d = m.get(level)
    if (d == null) {
      d = new java.util.zip.Deflater(level, true)
      m.put(level, d)
    }
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

object LuhnImpl {
  /** Luhn (mod-10) checksum validity of an all-digit string; false for
    * anything containing a non-digit or shorter than 2 digits (a
    * candidate that is not even a digit run is not a card number). */
  def luhnValid(s: UTF8String): Boolean = {
    val str = s.toString
    val n = str.length
    if (n < 2) return false
    var sum = 0
    var i = n - 1
    var second = false
    while (i >= 0) {
      val c = str.charAt(i)
      if (c < '0' || c > '9') return false
      var v = c - '0'
      if (second) { v *= 2; if (v > 9) v -= 9 }
      sum += v
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }
}

case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level in [1, 9], got $level")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    CompressImpl.deflateLen(v.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.CompressImpl.deflateLen($c, $level)")
  override protected def withNewChildInternal(c: Expression): DeflateLen =
    copy(child = c)
}

case class LuhnValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    LuhnImpl.luhnValid(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.LuhnImpl.luhnValid($c)")
  override protected def withNewChildInternal(c: Expression): LuhnValid =
    copy(child = c)
}

object SignalExprs {
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent: re-registering per call floods logs with
    // "SimpleFunctionRegistry ... replaced a previously registered
    // function" warnings (one per query in a bench run)
    if (reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_deflate_len"))) return
    reg.createOrReplaceTempFunction("graft_deflate_len",
      exprs => DeflateLen(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction("graft_luhn",
      exprs => LuhnValid(exprs.head), "built-in")
  }

  def deflateLen(spark: org.apache.spark.sql.SparkSession, c: Column,
                 level: Int = 6): Column = {
    ensureRegistered(spark)
    call_function("graft_deflate_len", c,
      org.apache.spark.sql.functions.lit(level))
  }
  def luhnValid(spark: org.apache.spark.sql.SparkSession,
                c: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_luhn", c)
  }
}
