package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-CODEPOINT character counts of a string as `map<string,bigint>`
  * — the scan-local census the q237 character-entropy operator
  * explodes instead of one row per character (r14 VERDICT #6: the
  * explode materialized |chars| rows per document before the first
  * map-side combine; this emits ≤ |alphabet| map entries per document
  * straight from the scan, so nothing per-character ever exists as a
  * row).
  *
  * Codepoint, not UTF-16 code unit (r14 ADVICE): Spark's
  * `split(text, '')` is Java-regex based and splits a supplementary
  * character (emoji, rare CJK) into two lone surrogates, while the
  * DuckDB oracle's `string_split(text, '')` splits per Unicode
  * codepoint — per-(doc,char) counts, n, and the entropy itself
  * diverged on any non-BMP corpus. This expression iterates
  * `codePointAt`/`charCount`, so surrogate pairs stay one key and the
  * two engines agree on EVERY corpus, not just ASCII/BMP ones
  * (EntropySpec pins the supplementary-plane parity).
  *
  * Codegen'd via a static call ([[Porter2Stem]] convention) so the
  * census stays inside WholeStageCodegen.
  */
case class CodepointCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"codepoint_counts requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CodepointCounts.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.expressions.CodepointCounts.count($in)")

  override protected def withNewChildInternal(
      newChild: Expression): CodepointCounts = copy(child = newChild)

  override def prettyName: String = "codepoint_counts"
}

object CodepointCounts {

  /** One pass over the UTF-16 form, advancing by `Character.charCount`
    * so a surrogate pair contributes ONE key. First-seen key order
    * (irrelevant to consumers — the map is exploded into rows). */
  def count(s: UTF8String): MapData = {
    val str = s.toString
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < str.length) {
      val n = Character.charCount(str.codePointAt(i))
      val key = str.substring(i, i + n)
      val prev = m.get(key)
      m.put(key, java.lang.Long.valueOf(
        if (prev == null) 1L else prev.longValue() + 1L))
      i += n
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue.longValue()
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Column API: per-codepoint counts of a string column. */
  def counts(c: Column): Column =
    ColumnBridge.column(CodepointCounts(ColumnBridge.expression(c)))
}
