package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst wrapper around [[graft.functions.Porter2.stem]] —
  * the Snowball English stemmer as a codegen'd unary expression, so
  * stemmed FTS (q135) and vocabulary rollups (q52) stay inside
  * WholeStageCodegen (one static call per token, no Row boxing, no
  * UDF serialization). The reference gets the identical stemmer from
  * Postgres `to_tsquery('english', …)` (`search.py:61`).
  */
case class Porter2Stem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"porter2_stem requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.Porter2.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Porter2.stem($in.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): Porter2Stem = copy(child = newChild)

  override def prettyName: String = "porter2_stem"
}

object Porter2Stem {
  /** Column API: Snowball English stem of a lowercase token column. */
  def stem(c: Column): Column =
    ColumnBridge.column(Porter2Stem(ColumnBridge.expression(c)))
}
