package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

import graft.sources.{DatePartitionedSink, IncrementalMergeDeclined, MergeSink}

/** SQL-facing `MERGE INTO` over graft [[MergeSink]] tables (SURVEY.md §2.1
  * S4/S5 — the reference's `INSERT … ON CONFLICT` load surface, which its
  * users drive from SQL, dags/etl.py:66-121).
  *
  * Spark's analyzer fully resolves a `MergeIntoTable` whose target is a
  * temp view (children, ON condition, actions, star expansion) but can
  * only EXECUTE it against a DSv2 table with row-level-operation support.
  * [[GraftMergeRule]] intercepts the resolved node when the target is a
  * view registered through [[SqlMerge.register]] and lowers it onto the
  * sink:
  *
  *  - '''fast path''' — the two reference shapes:
  *    `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *`
  *    → [[MergeSink.mergeLastWins]] (ON CONFLICT DO UPDATE), and
  *    `WHEN NOT MATCHED THEN INSERT *` alone →
  *    [[MergeSink.mergeIfAbsent]] (DO NOTHING). These ride the sinks'
  *    INCREMENTAL partition-pruned merge — O(touched partitions), the
  *    shape that survives 100 TB.
  *  - '''general path''' — conditional UPDATE/DELETE, explicit
  *    assignments, `WHEN NOT MATCHED BY SOURCE`: expanded to a single
  *    full-outer join + row-action projection (the standard MERGE
  *    lowering, cf. Delta/Iceberg) and written back via
  *    [[MergeSink.overwriteAll]]. This is an O(table) rewrite by design —
  *    arbitrary per-row actions cannot be partition-pruned without
  *    knowing which partitions the condition touches.
  *
  * After either path the target temp view is re-registered from the sink
  * so subsequent statements read the post-merge table.
  *
  * The same seam lowers the other two row-level DML statements over a
  * registered view: `UPDATE name SET … [WHERE …]` (projection rewrite)
  * and `DELETE FROM name WHERE …` (keep-filter rewrite), both through
  * [[MergeSink.overwriteAll]].
  */
object SqlMerge {

  private val targets = new ConcurrentHashMap[String, MergeSink]()

  private def norm(n: String): String = n.toLowerCase(java.util.Locale.ROOT)

  /** Expose `sink` to SQL as temp view `name` and accept MERGE INTO
    * statements targeting it. The view snapshots the sink's CURRENT
    * contents; merges through this module refresh it automatically,
    * out-of-band sink writes need a re-register.
    *
    * Duplicate-source-key semantics follow Postgres ON CONFLICT: the
    * DO UPDATE shape FAILS on more than one source row per key
    * ("cannot affect row a second time" — same violation the general
    * path raises), while the DO NOTHING shape tolerates duplicates and
    * inserts ONE row per absent key (which of the duplicates wins is
    * unspecified, as in any unordered batch). */
  def register(spark: SparkSession, name: String, sink: MergeSink): Unit = {
    sink.read(spark).createOrReplaceTempView(name)
    targets.put(norm(name), sink)
  }

  def unregister(spark: SparkSession, name: String): Unit = {
    targets.remove(norm(name))
    spark.catalog.dropTempView(name)
  }

  /** The registered sink a resolved MERGE target plan refers to: temp
    * views resolve to `SubqueryAlias(name, …)`, and `MERGE INTO t AS x`
    * adds one more alias wrapper, so ONLY the strict alias chain from
    * the root is unwrapped. Descending any further (into the view's
    * definition) would be wrong: an UNREGISTERED view that merely reads
    * FROM a registered view must not resolve to that inner sink — the
    * statement would silently rewrite the registered table with the
    * outer view's output. Such targets fall through to Spark's own
    * handling (a loud unsupported-target error). */
  @annotation.tailrec
  private[plans] def sinkFor(target: LogicalPlan): Option[(String, MergeSink)] =
    target match {
      case SubqueryAlias(ident, child) =>
        if (targets.containsKey(norm(ident.name)))
          Some((ident.name, targets.get(norm(ident.name))))
        else sinkFor(child)
      case _ => None
    }

  private[plans] def registered(name: String): Option[MergeSink] =
    Option(targets.get(norm(name)))

  /** TIME-TRAVEL table function body — `graft_version('name', v)` in SQL
    * resolves to the registered txn sink's table exactly as manifest `v`
    * committed it (TxnParquetSink.readVersion: fails loudly past the
    * retention window, never silently serves other data). A table
    * FUNCTION rather than `VERSION AS OF` because Spark's relation
    * resolution rejects time-travel clauses on temp views before any
    * injected rule can see them. Arguments must be literals (the name
    * and version are resolved at analysis time). */
  private[plans] def versionPlan(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : LogicalPlan = {
    require(exprs.length == 2,
      "graft_version(name, version) takes exactly two arguments")
    require(exprs.forall(_.foldable),
      "graft_version arguments must be literals")
    val name = String.valueOf(exprs.head.eval())
    val v = exprs(1).eval() match {
      case n: Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"graft_version: version must be an integer literal, got $other")
    }
    val spark = org.apache.spark.sql.SparkSession.active
    val sink = registered(name).getOrElse(throw new IllegalArgumentException(
      s"graft_version: no registered table named '$name'"))
    sink match {
      case t: graft.sources.VersionedSink =>
        t.readVersion(spark, v).queryExecution.analyzed
      case other => throw new UnsupportedOperationException(
        s"graft_version: table '$name' (${other.getClass.getSimpleName}) " +
          "does not keep versions — only transactional (VersionedSink) " +
          "tables time-travel")
    }
  }

  /** `TIMESTAMP AS OF` resolution — `graft_version_ts('name', ts)`:
    * the latest version committed at or before the wall-clock
    * timestamp (VersionedSink.versionAt — commit-artifact mtimes, the
    * convention Delta documents). A timestamp before the oldest
    * RETAINED commit fails loudly; one past the live commit reads the
    * live table. */
  private[plans] def versionTsPlan(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : LogicalPlan = {
    require(exprs.length == 2,
      "graft_version_ts(name, timestamp) takes exactly two arguments")
    require(exprs.forall(_.foldable),
      "graft_version_ts arguments must be literals")
    val name = String.valueOf(exprs.head.eval())
    val spark = org.apache.spark.sql.SparkSession.active
    val micros = org.apache.spark.sql.catalyst.expressions.Cast(
      exprs(1), org.apache.spark.sql.types.TimestampType,
      Option(spark.sessionState.conf.sessionLocalTimeZone)).eval() match {
      case l: java.lang.Long => l.longValue()
      case other => throw new IllegalArgumentException(
        s"graft_version_ts: cannot interpret '${exprs(1).sql}' as a timestamp" +
          (if (other == null) " (casts to NULL)" else ""))
    }
    val sink = registered(name).getOrElse(throw new IllegalArgumentException(
      s"graft_version_ts: no registered table named '$name'"))
    sink match {
      case t: graft.sources.VersionedSink =>
        val v = t.versionAt(spark, micros).getOrElse(
          throw new IllegalArgumentException(
            s"graft_version_ts: table '$name' has no commit at or before " +
              s"${exprs(1).sql} — the timestamp predates the retained history"))
        t.readVersion(spark, v).queryExecution.analyzed
      case other => throw new UnsupportedOperationException(
        s"graft_version_ts: table '$name' (${other.getClass.getSimpleName}) " +
          "does not keep versions — only transactional (VersionedSink) " +
          "tables time-travel")
    }
  }
}

/** Resolution-stage lowering: swap a fully-resolved [[MergeIntoTable]]
  * over a registered view for [[GraftMergeCommand]] before Spark's
  * DSv2-only rewrite/check machinery can reject it. Injected via
  * [[GraftExtensions]] at the END of the resolution batch (and again
  * post-hoc, idempotently), so every built-in resolution step — view
  * lookup, reference resolution, star expansion, assignment alignment —
  * has already run on the node we capture. */
final case class GraftMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case m: MergeIntoTable if readyToLower(m) =>
      SqlMerge.sinkFor(m.targetTable) match {
        case Some((name, sink)) =>
          require(!m.withSchemaEvolution,
            s"MERGE INTO $name: WITH SCHEMA EVOLUTION is not supported by graft merge " +
              "targets — evolve the table schema with an explicit rewrite first")
          GraftMergeCommand(name, sink, MergeSpec.from(name, sink, m))
        case None => m // not ours: leave for Spark's own (DSv2) handling
      }
    // the other two row-level DML statements, same lowering seam: a
    // resolved UPDATE/DELETE over a registered view becomes a
    // filter/projection rewrite through MergeSink.overwriteAll
    case u: UpdateTable
        if u.childrenResolved && u.condition.forall(_.resolved) &&
          u.assignments.forall(_.resolved) =>
      SqlMerge.sinkFor(u.table) match {
        case Some((name, sink)) =>
          MergeSpec.requireAttributeKeys(s"UPDATE $name", u.assignments)
          GraftUpdateCommand(name, sink, u.table, u.assignments, u.condition)
        case None => u
      }
    case d: DeleteFromTable if d.childrenResolved && d.condition.resolved =>
      SqlMerge.sinkFor(d.table) match {
        case Some((name, sink)) =>
          GraftDeleteCommand(name, sink, d.table, d.condition)
        case None => d
      }
  }

  /** Everything resolved except possibly star actions (which
    * [[MergeSpec.from]] expands itself when the analyzer left them —
    * non-DSv2 targets don't always get Spark's star expansion). */
  private def readyToLower(m: MergeIntoTable): Boolean = {
    def actionReady(a: MergeAction): Boolean = a match {
      case u: UpdateAction => u.condition.forall(_.resolved) && u.assignments.forall(_.resolved)
      case i: InsertAction => i.condition.forall(_.resolved) && i.assignments.forall(_.resolved)
      case d: DeleteAction => d.condition.forall(_.resolved)
      case s: UpdateStarAction => s.condition.forall(_.resolved)
      case s: InsertStarAction => s.condition.forall(_.resolved)
      case _ => false
    }
    m.childrenResolved && m.mergeCondition.resolved &&
      (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions).forall(actionReady)
  }
}

/** The analyzed MERGE, normalized: stars expanded to explicit
  * per-column assignments, ON-condition equi-keys extracted. Plain case
  * class (not a TreeNode) — its expressions are final, no further
  * analyzer rewriting is wanted. */
final case class MergeSpec(
    viewName: String,
    target: LogicalPlan,
    source: LogicalPlan,
    condition: Expression,
    matched: Seq[MergeAction],
    notMatched: Seq[MergeAction],
    bySource: Seq[MergeAction]) {

  /** ON-condition as pure same-column equi-join keys
    * (targetAttr, sourceAttr) — None when any conjunct is anything else
    * (expression, cast, inequality), which disqualifies the fast path. */
  lazy val equiKeys: Option[Seq[(Attribute, Attribute)]] = {
    val conjuncts = splitConjuncts(condition)
    val tOut = AttributeSet(target.output)
    val sOut = AttributeSet(source.output)
    val pairs = conjuncts.map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) => Some((a: Attribute, b: Attribute))
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tOut.contains(a) && sOut.contains(b) => Some((a: Attribute, b: Attribute))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

object MergeSpec {

  def from(name: String, sink: MergeSink, m: MergeIntoTable): MergeSpec = {
    val expand = expandStar(m.targetTable, m.sourceTable, name) _
    val spec = MergeSpec(
      viewName = name,
      target = m.targetTable,
      source = m.sourceTable,
      condition = m.mergeCondition,
      matched = m.matchedActions.map(expand),
      notMatched = m.notMatchedActions.map(expand),
      bySource = m.notMatchedBySourceActions.map(expand))
    (spec.matched ++ spec.notMatched ++ spec.bySource).foreach {
      case UpdateAction(_, asg, _) => requireAttributeKeys(s"MERGE INTO $name", asg)
      case InsertAction(_, asg) => requireAttributeKeys(s"MERGE INTO $name", asg)
      case _ => ()
    }
    spec
  }

  /** Row-level DML here assigns whole top-level columns only. A nested-
    * field key (`SET addr.city = …` resolves to a GetStructField chain)
    * would silently match none of the per-column rewrite lookups and the
    * statement would report success while writing NOTHING — fail loudly
    * instead. */
  private[plans] def requireAttributeKeys(ctx: String,
      assignments: Seq[Assignment]): Unit =
    assignments.foreach { a =>
      a.key match {
        case _: Attribute => ()
        case other => throw new UnsupportedOperationException(
          s"$ctx: nested-field assignment to '${other.sql}' is not supported — " +
            "row-level updates assign whole top-level columns; assign the full " +
            "struct value instead (e.g. SET s = named_struct(...))")
      }
    }

  /** `UPDATE SET *` / `INSERT *` → one by-name assignment per TARGET
    * column from the source (the SQL-standard star semantics; fails
    * loudly when the source lacks a target column). */
  private def expandStar(target: LogicalPlan, source: LogicalPlan, name: String)
                        (a: MergeAction): MergeAction = {
    def srcAttr(col: Attribute): Attribute =
      source.output.find(_.name.equalsIgnoreCase(col.name)).getOrElse(
        throw new IllegalArgumentException(
          s"MERGE INTO $name: UPDATE SET * / INSERT * needs source column '${col.name}' " +
            s"matching the target; source has [${source.output.map(_.name).mkString(", ")}]"))
    a match {
      case UpdateStarAction(cond) =>
        UpdateAction(cond, target.output.map(t => Assignment(t, srcAttr(t))), fromStar = true)
      case InsertStarAction(cond) =>
        InsertAction(cond, target.output.map(t => Assignment(t, srcAttr(t))))
      case other => other
    }
  }
}

/** Driver-side MERGE executor. Output is empty (like Spark's own v2
  * merge); effects land in the sink and the refreshed temp view. */
final case class GraftMergeCommand(name: String, sink: MergeSink, spec: MergeSpec)
    extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    SqlMergeExec.execute(spark, sink, spec)
    // subsequent statements must see the post-merge table
    sink.read(spark).createOrReplaceTempView(name)
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand $name, matched=${spec.matched.size}, " +
      s"notMatched=${spec.notMatched.size}, bySource=${spec.bySource.size}"
}

/** `UPDATE name SET … [WHERE …]` over a registered sink: a projection
  * rewrite — each assigned column becomes
  * `CASE WHEN cond THEN value ELSE current END`, unassigned columns
  * pass through; NULL conditions update nothing (SQL semantics).
  *
  * PARTITION-PRUNED on a [[DatePartitionedSink]] when the statement has
  * a WHERE clause and the assignments do not move the partition
  * timestamp: one filtered pass finds the affected dates (predicate
  * pushed to the scan), the projection runs over the manifest/partition-
  * pruned read of ONLY those dates, and [[DatePartitionedSink
  * .replaceDates]] rewrites only them — O(touched dates). Everything
  * else (no WHERE, tsCol reassigned, snapshot sinks) is the honest
  * full rewrite via [[MergeSink.overwriteAll]]. */
final case class GraftUpdateCommand(name: String, sink: MergeSink,
    table: LogicalPlan, assignments: Seq[Assignment],
    condition: Option[Expression]) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  private def projected(plan: LogicalPlan,
                        remap: Expression => Expression): LogicalPlan = {
    val applies = condition.map(c => EqualNullSafe(remap(c), Literal(true)))
    val outCols = plan.output.map { t =>
      val v = assignments.collectFirst {
        case Assignment(k: Attribute, value) if k.name.equalsIgnoreCase(t.name) =>
          val r = remap(value)
          if (r.dataType == t.dataType) r else Cast(r, t.dataType)
      }
      val updated = v.map { value =>
        applies.fold(value)(c => CaseWhen(Seq(c -> value), Some(t: Expression)))
      }.getOrElse(t: Expression)
      Alias(updated, t.name)()
    }
    Project(outCols, plan)
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val movesPartition = (p: DatePartitionedSink) => assignments.exists {
      case Assignment(k: Attribute, _) => k.name.equalsIgnoreCase(p.tsCol)
      case _ => true // non-column assignment target: be conservative
    }
    (sink, condition) match {
      case (p: DatePartitionedSink, Some(c)) if !movesPartition(p) =>
        val dates = SqlMergeExec.affectedDates(spark, table, c, p.tsCol)
        if (dates.nonEmpty) {
          val pruned = p.prunedRead(spark, dates).queryExecution.analyzed
          p.replaceDates(dates, GraftSqlBridge.ofRows(spark,
            projected(pruned, SqlMergeExec.remapTo(pruned))))
        }
      case _ =>
        sink.overwriteAll(GraftSqlBridge.ofRows(spark,
          projected(table, identity)))
    }
    sink.read(spark).createOrReplaceTempView(name)
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftUpdateCommand $name, ${assignments.size} assignment(s)"
}

/** `DELETE FROM name WHERE …` over a registered sink: keep exactly the
  * rows whose condition is NOT true (NULL keeps, per SQL).
  * PARTITION-PRUNED on a [[DatePartitionedSink]]: affected dates from
  * one pushed-down filtered pass, then [[DatePartitionedSink
  * .replaceDates]] rewrites only those dates with their kept rows —
  * a date the delete empties vanishes from the table. Snapshot sinks
  * take the full rewrite via [[MergeSink.overwriteAll]]. */
final case class GraftDeleteCommand(name: String, sink: MergeSink,
    table: LogicalPlan, condition: Expression) extends LeafRunnableCommand {

  override def output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    sink match {
      case p: DatePartitionedSink =>
        val dates = SqlMergeExec.affectedDates(spark, table, condition, p.tsCol)
        if (dates.nonEmpty) {
          val pruned = p.prunedRead(spark, dates).queryExecution.analyzed
          val keep = Not(EqualNullSafe(
            SqlMergeExec.remapTo(pruned)(condition), Literal(true)))
          p.replaceDates(dates, GraftSqlBridge.ofRows(spark, Filter(keep, pruned)))
        }
      case s =>
        val keep = Not(EqualNullSafe(condition, Literal(true)))
        s.overwriteAll(GraftSqlBridge.ofRows(spark, Filter(keep, table)))
    }
    sink.read(spark).createOrReplaceTempView(name)
    Seq.empty
  }

  override def simpleString(maxFields: Int): String =
    s"GraftDeleteCommand $name"
}

private[plans] object SqlMergeExec {

  /** Rebind an expression's column references onto `to`'s output BY NAME
    * (case-insensitive): the expression was resolved against the
    * registered view's frozen plan; the pruned re-read carries the same
    * columns under fresh exprIds. */
  private[plans] def remapTo(to: LogicalPlan)(e: Expression): Expression =
    e.transform {
      case a: AttributeReference =>
        to.output.find(_.name.equalsIgnoreCase(a.name)).getOrElse(
          throw new IllegalStateException(
            s"column ${a.name} missing on pruned re-read of a registered table"))
    }

  /** The distinct partition dates a row-level predicate touches — ONE
    * filtered pass (predicate pushed to the scan), a driver-side set
    * bounded by the table's date count, the same move the incremental
    * merges make. NULL-condition rows never match (EqualNullSafe true). */
  private[plans] def affectedDates(spark: SparkSession, table: LogicalPlan,
      condition: Expression, tsCol: String): Seq[java.sql.Date] =
    GraftSqlBridge.ofRows(spark,
        Filter(EqualNullSafe(condition, Literal(true)), table))
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col(tsCol)).as("__d"))
      .distinct().collect().map(_.getAs[java.sql.Date]("__d")).toSeq

  def execute(spark: SparkSession, sink: MergeSink, spec: MergeSpec): Unit =
    fastPath(spec) match {
      case Some((lastWins, keys, batchPlan)) =>
        val batch = GraftSqlBridge.ofRows(spark, batchPlan)
        // SQL MERGE semantics (and Postgres ON CONFLICT DO UPDATE:
        // "cannot affect row a second time") require a loud failure when
        // the source carries duplicate keys for an UPDATE merge — the
        // general path raises the same violation via its join-cardinality
        // check, so the fast path must not silently pick a winner. One
        // cheap map-side-combined aggregate on the batch, before any
        // write. (DO NOTHING keeps Postgres' tolerant shape: duplicates
        // collapse to one inserted row, sink-side dropDuplicates.)
        if (lastWins) requireUniqueKeys(spec.viewName, batch, keys)
        try {
          if (lastWins) sink.mergeLastWins(batch, keys) else sink.mergeIfAbsent(batch, keys)
        } catch {
          // a sink DECLINING the incremental form (dedicated type — e.g.
          // date-partitioned sinks require the partition timestamp in the
          // merge key) does not make the MERGE wrong — fall back to the
          // always-correct full rewrite, loudly. Any other failure
          // (schema mismatch, bad sink state) propagates.
          case e: IncrementalMergeDeclined =>
            log.warn(s"MERGE INTO ${spec.viewName}: incremental merge declined " +
              s"(${e.getMessage}); falling back to full-table rewrite")
            generalPath(spark, sink, spec)
        }
      case None => generalPath(spark, sink, spec)
    }

  private def requireUniqueKeys(view: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dup = batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(org.apache.spark.sql.functions.col("__graft_n") > 1)
    if (!dup.isEmpty) throw new IllegalStateException(
      s"MERGE INTO $view: cardinality violation — the source has more than one " +
        s"row per merge key (${keys.mkString(", ")}); an UPDATE merge cannot " +
        "affect a target row twice — deduplicate the source on the ON keys first")
  }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // ---------------------------------------------------------------- fast

  /** Detect the two ON-CONFLICT shapes and build the batch projection:
    * source projected to the exact target schema (column names, order,
    * types). Returns (lastWins?, keys, batchPlan). */
  private def fastPath(spec: MergeSpec): Option[(Boolean, Seq[String], LogicalPlan)] = {
    if (spec.bySource.nonEmpty) return None
    val keys = spec.equiKeys.getOrElse(return None)
    if (keys.isEmpty) return None

    def fullCoverage(assignments: Seq[Assignment]): Option[Map[ExprId, Expression]] = {
      val byTarget = assignments.flatMap { asg =>
        asg.key match {
          case k: Attribute => Some(k.exprId -> asg.value)
          case _ => None // nested-field assignment: general path
        }
      }.toMap
      val sOut = AttributeSet(spec.source.output)
      val ok = byTarget.size == assignments.size &&
        spec.target.output.forall(t => byTarget.contains(t.exprId)) &&
        // values must be computable from the source row alone
        byTarget.values.forall(_.references.subsetOf(sOut))
      if (ok) Some(byTarget) else None
    }

    // key columns must be assigned their own ON-condition source key —
    // otherwise the written key differs from the matched key and the
    // incremental join-on-names lowering would change semantics
    def keysPreserved(vals: Map[ExprId, Expression]): Boolean =
      keys.forall { case (t, s) =>
        vals.get(t.exprId).exists {
          case a: Attribute => a.exprId == s.exprId
          case Cast(a: Attribute, _, _, _) => a.exprId == s.exprId
          case _ => false
        }
      }

    def batchPlan(vals: Map[ExprId, Expression]): LogicalPlan =
      Project(spec.target.output.map { t =>
        val v = vals(t.exprId)
        val cast = if (v.dataType == t.dataType) v else Cast(v, t.dataType)
        Alias(cast, t.name)()
      }, spec.source)

    val keyNames = keys.map(_._1.name)

    (spec.matched, spec.notMatched) match {
      // ON CONFLICT DO UPDATE: unconditional UPDATE covering every column
      // + unconditional INSERT with the SAME per-column values
      case (Seq(UpdateAction(None, uAsg, _)), Seq(InsertAction(None, iAsg))) =>
        for {
          u <- fullCoverage(uAsg)
          i <- fullCoverage(iAsg)
          if keysPreserved(u)
          if spec.target.output.forall(t => u(t.exprId).semanticEquals(i(t.exprId)))
        } yield (true, keyNames, batchPlan(u))
      // ON CONFLICT DO NOTHING: insert-only
      case (Seq(), Seq(InsertAction(None, iAsg))) =>
        for {
          i <- fullCoverage(iAsg)
          if keysPreserved(i)
        } yield (false, keyNames, batchPlan(i))
      case _ => None
    }
  }

  // ------------------------------------------------------------- general

  /** Standard MERGE lowering, in two shapes chosen by whether any
    * `WHEN MATCHED` action exists:
    *
    *  - '''with matched actions''' — full-outer join target⟗source on
    *    the ON condition, then one projection applying the FIRST
    *    matching action per row (SQL action-order semantics) and a
    *    keep-flag filter for DELETEs / unmatched rows. Preceded by the
    *    cardinality check — SQL MERGE must fail when one target row
    *    matches several source rows; an aggregate on the inner-join
    *    shape, map-side combined, failing BEFORE anything is written.
    *  - '''without matched actions''' — matched target rows pass
    *    through UNCHANGED, so the full-outer join's fan-out (one output
    *    row per matching source row) would DUPLICATE them. Lower
    *    instead onto joins that cannot fan out the kept side: target
    *    semi/anti joins for the target rows (by-source actions apply to
    *    the anti side) unioned with a source-anti-target join for the
    *    inserts. Also the cheaper plan — semi/anti joins beat a
    *    full-outer join. Duplicate source matches are LEGAL here (SQL:
    *    no second update/delete of any target row ever happens), so no
    *    cardinality check.
    *
    * Either way the result is written via [[MergeSink.overwriteAll]].
    */
  def generalPath(spark: SparkSession, sink: MergeSink, spec: MergeSpec): Unit = {

    def cond(a: MergeAction): Expression = a match {
      case UpdateAction(c, _, _) => c.getOrElse(Literal(true))
      case InsertAction(c, _) => c.getOrElse(Literal(true))
      case DeleteAction(c) => c.getOrElse(Literal(true))
      case other => throw new IllegalStateException(s"unexpected merge action $other")
    }

    def assigned(assignments: Seq[Assignment], t: Attribute): Expression = {
      val v = assignments.collectFirst {
        case Assignment(k: Attribute, value) if k.exprId == t.exprId => value
      }.getOrElse(t) // UPDATE leaves unassigned columns untouched
      if (v.dataType == t.dataType) v else Cast(v, t.dataType)
    }

    def insertedValue(assignments: Seq[Assignment], t: Attribute): Expression = {
      val v = assignments.collectFirst {
        case Assignment(k: Attribute, value) if k.exprId == t.exprId => value
      }.getOrElse(Literal.create(null, t.dataType)) // INSERT leaves unassigned NULL
      if (v.dataType == t.dataType) v else Cast(v, t.dataType)
    }

    def updateBranches(actions: Seq[MergeAction], t: Attribute): Expression =
      CaseWhen(actions.map {
        case a @ UpdateAction(_, asg, _) => (cond(a), assigned(asg, t))
        case a: DeleteAction => (cond(a), Literal.create(null, t.dataType))
        case other => throw new IllegalStateException(s"unexpected matched action $other")
      }, Some(t: Expression))

    def insertBranches(actions: Seq[MergeAction], t: Attribute): Expression =
      CaseWhen(actions.map {
        case a @ InsertAction(_, asg) => (cond(a), insertedValue(asg, t))
        case other => throw new IllegalStateException(s"unexpected not-matched action $other")
      }, Some(Literal.create(null, t.dataType)))

    def keepBranches(actions: Seq[MergeAction], default: Boolean): Expression =
      CaseWhen(actions.map {
        case a: DeleteAction => (cond(a), Literal(false))
        case a => (cond(a), Literal(true))
      }, Some(Literal(default)))

    val merged: LogicalPlan =
      if (spec.matched.isEmpty) {
        // ---- no-fan-out shape: semi/anti joins, matched rows untouched
        val keptTarget: LogicalPlan =
          if (spec.bySource.isEmpty) spec.target // every target row kept as-is
          else {
            val matchedT = Join(spec.target, spec.source, LeftSemi,
              Some(spec.condition), JoinHint.NONE)
            val unmatchedT = Join(spec.target, spec.source, LeftAnti,
              Some(spec.condition), JoinHint.NONE)
            // by-source actions see target columns only (analyzer-enforced)
            val bySourceOut = spec.target.output.map(t =>
              Alias(updateBranches(spec.bySource, t), t.name)())
            Union(matchedT,
              Project(bySourceOut,
                Filter(keepBranches(spec.bySource, default = true), unmatchedT)))
          }
        if (spec.notMatched.isEmpty) keptTarget
        else {
          // insert conditions/values see source columns only
          // (analyzer-enforced), so the anti join has all they need
          val sourceOnly = Join(spec.source, spec.target, LeftAnti,
            Some(spec.condition), JoinHint.NONE)
          val insertOut = spec.target.output.map(t =>
            Alias(insertBranches(spec.notMatched, t), t.name)())
          Union(keptTarget,
            Project(insertOut,
              Filter(keepBranches(spec.notMatched, default = false), sourceOnly)))
        }
      } else {
        // ---- full-outer shape: per-row action projection + keep filter
        val tTag = Alias(Literal(true), "__graft_t")()
        val sTag = Alias(Literal(true), "__graft_s")()
        val tId = Alias(MonotonicallyIncreasingID(), "__graft_tid")()
        val tPlan = Project(spec.target.output ++ Seq(tTag, tId), spec.target)
        val sPlan = Project(spec.source.output :+ sTag, spec.source)
        val tMark = tTag.toAttribute
        val sMark = sTag.toAttribute
        val tIdRef = tId.toAttribute

        val join = Join(tPlan, sPlan, FullOuter, Some(spec.condition), JoinHint.NONE)

        val isMatched = And(EqualNullSafe(tMark, Literal(true)),
          EqualNullSafe(sMark, Literal(true)))
        val isSourceOnly = And(EqualNullSafe(sMark, Literal(true)),
          Not(EqualNullSafe(tMark, Literal(true))))

        // cardinality violation check: >1 source row per matched target row
        val one = Alias(AggregateExpression(
          Count(Seq(Literal(1))), Complete, isDistinct = false), "__graft_n")()
        val counts = Aggregate(Seq(tIdRef), Seq(one), Filter(isMatched, join), None)
        val dup = Filter(GreaterThan(one.toAttribute, Literal(1L)), counts)
        if (!GraftSqlBridge.ofRows(spark, dup).isEmpty) {
          throw new IllegalStateException(
            s"MERGE INTO ${spec.viewName}: cardinality violation — a target row matches " +
              "more than one source row; deduplicate the source on the ON keys first")
        }

        val outCols = spec.target.output.map { t =>
          val matchedVal: Expression = updateBranches(spec.matched, t)
          val insertVal: Expression =
            if (spec.notMatched.isEmpty) Literal.create(null, t.dataType)
            else insertBranches(spec.notMatched, t)
          val bySourceVal: Expression =
            if (spec.bySource.isEmpty) t else updateBranches(spec.bySource, t)
          Alias(CaseWhen(Seq(
            isMatched -> matchedVal,
            isSourceOnly -> insertVal),
            Some(bySourceVal)), t.name)()
        }
        val bySourceKeep: Expression =
          if (spec.bySource.isEmpty) Literal(true)
          else keepBranches(spec.bySource, default = true)
        val keep = CaseWhen(Seq(
          isMatched -> keepBranches(spec.matched, default = true),
          // a source row matching NO insert action's condition is dropped
          isSourceOnly -> (if (spec.notMatched.isEmpty) Literal(false)
                           else keepBranches(spec.notMatched, default = false))),
          Some(bySourceKeep))

        Project(outCols, Filter(keep, join))
      }
    sink.overwriteAll(GraftSqlBridge.ofRows(spark, merged))
  }
}
