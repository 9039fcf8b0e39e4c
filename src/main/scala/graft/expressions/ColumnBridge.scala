package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridging for the native expressions' Column
  * APIs. The conversions live in private[sql] helpers in Spark 4
  * whose static forms are public bytecode, so bind them once here by
  * reflection rather than shading into the org.apache.spark namespace
  * — and once only: the Spark-internal class has already moved across
  * versions, and every expression companion carrying its own copy
  * turns the next upgrade into a grep hunt. */
private[expressions] object ColumnBridge {
  private val exprUtils =
    Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private val toColumn =
    exprUtils.getMethod("column", classOf[Expression])
  private val toExpression =
    exprUtils.getMethod("expression", classOf[Column])

  def column(e: Expression): Column =
    toColumn.invoke(null, e).asInstanceOf[Column]

  def expression(c: Column): Expression =
    toExpression.invoke(null, c).asInstanceOf[Expression]
}
