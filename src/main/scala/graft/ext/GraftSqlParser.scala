package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL MAINTENANCE verbs for the lake table (r19 — VERDICT r18 #3):
  * `OPTIMIZE <target>` and `VACUUM <target>` (+ optional `IF NEEDED`),
  * the statements Delta/Iceberg users type for table maintenance —
  * Spark's parser has no such verbs, so (the Delta connector's own
  * shape) a delegating parser intercepts exactly these two statements
  * and hands EVERYTHING else to the session's parser verbatim.
  *
  * The intercept triggers on the leading keyword alone; the target
  * parses through the DELEGATE's `parseMultipartIdentifier` (so
  * backquotes, dots-in-paths and case behave exactly like every other
  * identifier in the dialect), and resolution to a gentable — path
  * form or catalog name — happens at RUN time in
  * [[graft.sources.GenTableOptimizeCommand]] (the statement is a
  * command; there is nothing to resolve at parse time). A malformed
  * target falls back to the delegate's parse of the full text, so the
  * user sees Spark's own syntax error, not a bespoke one.
  */
case class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  // OPTIMIZE|VACUUM <identifier> [IF NEEDED] — one statement, nothing
  // else (no WHERE, no options: compact is whole-table by design)
  private val Maintenance =
    """(?is)^\s*(OPTIMIZE|VACUUM)\s+(.+?)(\s+IF\s+NEEDED)?\s*;?\s*$""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Maintenance(_, target, gate) =>
      try {
        val parts = delegate.parseMultipartIdentifier(target)
        graft.sources.GenTableOptimizeCommand(parts, gate != null)
      } catch {
        // not an identifier-shaped target: the delegate's own error
        case _: org.apache.spark.sql.catalyst.parser.ParseException =>
          delegate.parsePlan(sqlText)
      }
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}
