package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical composition (UAX #15) as a codegen'd unary
  * expression over the JDK's `java.text.Normalizer` — the
  * canonical-equivalence step byte-level dedup is blind to: "café"
  * with precomposed U+00E9 and "cafe" + combining U+0301 are the SAME
  * text under canonical equivalence but different UTF-8 byte strings,
  * so an md5-fingerprint dedup keeps both. Web corpora genuinely mix
  * the forms (macOS filenames and some editors emit NFD; most of the
  * web is NFC), which is why normalize-then-fingerprint is standard
  * corpus hygiene.
  *
  * Codegen is a single static call per row (no Row boxing, no UDF
  * serialization); the fast path inside `Normalizer.isNormalized`
  * makes already-NFC ASCII text (the overwhelming majority) a cheap
  * scan-through.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfcNormalize.nfc(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expressions.NfcNormalize.nfc($in.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** NFC form of `s`; the isNormalized fast path skips the composer
    * entirely for the (typical) already-normalized input. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Column API: NFC canonical composition of a string column. */
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
