package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** Delegating SQL parser that makes the NATIVE time-travel syntax work
  * on registered graft transactional tables:
  *
  * {{{ SELECT … FROM fact VERSION AS OF 3 }}}
  *
  * Spark's grammar parses the clause for any relation, but relation
  * resolution rejects time travel on temp views BEFORE any injected
  * analyzer rule can see the node — so the rewrite happens at the parse
  * seam instead: a [[RelationTimeTravel]] whose target is a single-part
  * name registered through [[SqlMerge.register]] becomes the
  * `graft_version` table function, which the analyzer already resolves
  * (GraftExtensions.injectTableFunction) to the pinned manifest read.
  * The function form stays available; both spellings produce the same
  * plan.
  *
  * `TIMESTAMP AS OF <ts>` on a registered name rewrites the same way to
  * `graft_version_ts` (mtime-resolved version floor, the Delta
  * timestamp-travel convention).
  *
  * Pass-through discipline: anything else — unregistered names,
  * multi-part catalog identifiers — is left verbatim for Spark's own
  * handling (real DSv2 time travel keeps working). */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case RelationTimeTravel(rel: UnresolvedRelation, None, Some(version))
        if rel.multipartIdentifier.length == 1 &&
          SqlMerge.registered(rel.multipartIdentifier.head).isDefined &&
          version.nonEmpty && version.forall(_.isDigit) =>
      UnresolvedTableValuedFunction(Seq("graft_version"),
        Seq(Literal(rel.multipartIdentifier.head), Literal(version.toLong)))
    // TIMESTAMP AS OF <foldable ts expr> on a registered name → the
    // graft_version_ts function (same pass-through discipline: only
    // single-part registered names; everything else stays Spark's)
    case RelationTimeTravel(rel: UnresolvedRelation, Some(ts), None)
        if rel.multipartIdentifier.length == 1 &&
          SqlMerge.registered(rel.multipartIdentifier.head).isDefined =>
      UnresolvedTableValuedFunction(Seq("graft_version_ts"),
        Seq(Literal(rel.multipartIdentifier.head), ts))
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
