package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Join, JoinHint}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.functions.{call_function, col, lit}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.execution.SparkStrategy

/** The full custom-operator tier (SURVEY.md §4 / guide path (c)): a native
  * as-of join — LogicalPlan node + resolution Rule + Strategy + merge-join
  * SparkPlan — registered through SparkSessionExtensions.
  *
  * Semantics (identical to graft.operators.Relational.asOfJoin, which is
  * the composed reference): for each left row, the single most recent
  * right row with rightTs <= leftTs within the same key group; left-outer.
  *
  * Execution: both sides hash-partition on the key and sort by (key, ts)
  * — the same requirements SortMergeJoin declares, satisfied by
  * EnsureRequirements — then one streaming merge pass per partition with
  * O(1) state (the last matching right row). Compared to the union+window
  * composition this shuffles each side separately (no widened union
  * schema) and never materializes a window buffer.
  *
  * Entry: an ordinary left-outer join whose condition carries the
  * `graft_asof(lts, rts)` marker; the injected rule rewrites it into the
  * native node during analysis, preserving the join's output attributes.
  */

/** Boolean marker expression carried in the join condition. Never
  * evaluated — the rewrite rule consumes it. */
case class AsOfMarker(leftTs: Expression, rightTs: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(leftTs, rightTs)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    throw new UnsupportedOperationException(
      "graft_asof is a join marker; enable GraftExtensions so the as-of rewrite runs")
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    throw new UnsupportedOperationException("graft_asof marker cannot be compiled")
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): AsOfMarker =
    AsOfMarker(c(0), c(1))
}

/** Logical as-of join. Output = left.output ++ right.output (right side
  * nullable, as LeftOuter would give). */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinNode =
    copy(left = l, right = r)
}

/** Analyzer rule: Join(LeftOuter, cond = keyEquals && graft_asof(lts, rts))
  * → AsOfJoinNode. Runs post-resolution so all attributes are bound. */
object RewriteAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(l, r, LeftOuter, Some(cond), _) if j.resolved && containsMarker(cond) =>
      val (eqs, markers) = split(cond)
      markers match {
        case Seq(AsOfMarker(lts, rts)) =>
          val (lks, rks) = eqs.map { case EqualTo(a, b) =>
            if (a.references.subsetOf(l.outputSet)) (a, b) else (b, a)
          }.unzip
          AsOfJoinNode(l, r, lks, rks, lts, rts)
        case _ => j
      }
  }

  private def containsMarker(e: Expression): Boolean =
    e.exists(_.isInstanceOf[AsOfMarker])

  /** Flatten a conjunction into (equi-conditions, markers). */
  private def split(cond: Expression): (Seq[EqualTo], Seq[AsOfMarker]) = cond match {
    case And(a, b) =>
      val (e1, m1) = split(a); val (e2, m2) = split(b)
      (e1 ++ e2, m1 ++ m2)
    case e: EqualTo   => (Seq(e), Nil)
    case m: AsOfMarker => (Nil, Seq(m))
    case other =>
      throw new IllegalArgumentException(
        s"as-of join condition must be key equalities AND graft_asof(...); got $other")
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lks, rks, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lks, rks, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Merge-pass as-of join exec: children co-partitioned on keys, sorted by
  * (keys, ts). Per partition: sweep both sorted streams, keeping only the
  * latest right row at-or-before the current left timestamp. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both children must be hash-partitioned on the FULL key list
    * (`requireAllClusterKeys = true`): plain subset-clustering would let
    * one side arrive partitioned on fewer keys — individually valid, but
    * rows of the same key group would then land in different partition
    * indexes than the other side's and the merge would silently miss
    * matches. With full-key specs, EnsureRequirements' multi-child
    * compatibility check also equalizes partition COUNTS (re-shuffling a
    * side whose existing count differs), which `zipPartitions` needs. A
    * belt-and-braces runtime check in doExecute turns any future planner
    * regression into a loud error instead of wrong rows. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression trees; code-generate the
    // projections/orderings INSIDE each partition (generated classes
    // don't serialize)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val lOut = left.output
    val rOut = right.output
    val keySchema = org.apache.spark.sql.types.StructType(
      leftKeys.zipWithIndex.map { case (e, i) =>
        org.apache.spark.sql.types.StructField(s"k$i", e.dataType, e.nullable) })
    val tsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts", leftTs.dataType, leftTs.nullable)))
    val numRightCols = right.output.size
    val outAttrs = output

    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      s"AsOfJoinExec: children must be co-partitioned, got " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions} partitions " +
        "(EnsureRequirements should have equalized them)")
    lRdd.zipPartitions(rRdd) { (lIter, rIter) =>
      val lKeyGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyGen = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsGen  = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsGen  = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = GenerateOrdering.create(keySchema)
      val tsOrd = GenerateOrdering.create(tsSchema)
      val joiner = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(numRightCols)

      // buffered right stream
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTs: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyGen(rRow).copy()
          rTs = rTsGen(rRow).copy()
        } else { rRow = null; rKey = null; rTs = null }
      advanceRight()

      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyGen(lRow)
        val lTsRow = lTsGen(lRow)
        // drop any remembered match from a previous key group
        if (lastMatchKey != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
          lastMatch = null; lastMatchKey = null
        }
        // skip right rows from earlier key groups
        while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
        // consume same-key right rows with ts <= left ts; null-ts right
        // rows (sorted first) can never match — advance PAST them, or
        // they would stall the whole key group
        while (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
               (rTs.isNullAt(0) ||
                 (!lTsRow.isNullAt(0) && tsOrd.compare(rTs, lTsRow) <= 0))) {
          if (!rTs.isNullAt(0)) {
            lastMatch = rRow.copy()
            lastMatchKey = rKey.copy()
          }
          advanceRight()
        }
        joined(lRow, if (lastMatch != null) lastMatch else nullRight)
        joiner(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** User-facing API. Requires a session built with GraftExtensions (or
  * AsOf.install(spark) for an existing session's experimental methods). */
object AsOf {

  def marker(l: Column, r: Column): Column = call_function("graft_asof", l, r)

  def registerMarker(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent — see HashExprs.ensureRegistered
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_asof")))
      reg.createOrReplaceTempFunction(
        "graft_asof", exprs => AsOfMarker(exprs.head, exprs(1)), "built-in")
  }

  /** Install rule + strategy on an EXISTING session (extensions normally
    * inject them at build time via GraftExtensions). Idempotent. */
  def install(spark: SparkSession): Unit = {
    registerMarker(spark)
    val em = spark.experimental
    if (!em.extraOptimizations.contains(RewriteAsOfJoin))
      em.extraOptimizations = em.extraOptimizations :+ RewriteAsOfJoin
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfJoinStrategy
  }

  /** Native as-of join with the same output shape as
    * Relational.asOfJoin: left.* plus right's non-key non-ts columns. */
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val r2 = on.foldLeft(right) { (df, k) => df.withColumnRenamed(k, s"__r_$k") }
    val keyEq = on.map(k => left(k) === r2(s"__r_$k")).reduce(_ && _)
    val cond = keyEq && marker(left(leftTsCol), r2(rightTsCol))
    val joined = left.join(r2, cond, "left_outer")
    joined.drop(on.map(k => s"__r_$k"): _*).drop(r2(rightTsCol))
  }
}
