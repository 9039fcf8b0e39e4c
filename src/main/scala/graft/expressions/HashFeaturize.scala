package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text-embedding featurizer (P5 stand-in for the
  * reference's Ollama embedding call, `embeddings.py:12-15`): hash
  * each token of the lowercased input into one of `dims` signed
  * buckets, count, L2-normalize.
  *
  * Semantically identical to the HOF formulation
  * ([[graft.functions.Embeddings.featurizeHof]]) — same tokenizer
  * (maximal `[a-z0-9_]` runs of the lowercased text), same 60-bit
  * md5-prefix hash, same bucket/sign rule, same left-to-right double
  * accumulation for the norm — but it walks the token stream ONCE
  * into a dims-slot local array instead of unrolling one `aggregate`
  * HOF per output dimension (a ~dims× duplicated expression subtree
  * that cost ~49 s of codegen+eval per bench run at dims=64).
  *
  * Null input → null (the HOF variant returns an array of nulls,
  * which no caller relied on — every call site guards null text).
  * Zero tokens → all-zero vector (the zero-norm passthrough of
  * `embeddings.py:65-71`).
  */
case class HashFeaturize(child: Expression, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && dims > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_featurize requires a string input and positive dims, " +
        s"got ${child.dataType.simpleString}, dims=$dims")

  override def nullSafeEval(input: Any): Any =
    HashFeaturize.compute(input.asInstanceOf[UTF8String], dims)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // the heavy loop lives in a static helper; generated code stays a
    // one-line call, so the surrounding stage remains codegen'd
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.HashFeaturize.compute($c, $dims)")

  override protected def withNewChildInternal(
      newChild: Expression): HashFeaturize = copy(child = newChild)

  override def prettyName: String = "vec_featurize"
}

object HashFeaturize {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  @inline private def isTokByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == '_'

  /** One pass: tokenize → hash → signed bucket counts → L2 normalize.
    * Called from generated code (static forwarder on the companion
    * class), so it must stay a plain public method. */
  def compute(s: UTF8String, dims: Int): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val raw = new Array[Double](dims)
    val digest = md5.get()
    val n = bytes.length
    var i = 0
    while (i < n) {
      if (isTokByte(bytes(i))) {
        var j = i + 1
        while (j < n && isTokByte(bytes(j))) j += 1
        digest.reset()
        digest.update(bytes, i, j - i)
        val d = digest.digest()
        // first 15 hex chars of md5 as a 60-bit non-negative long —
        // identical to TextOps.hash60 / the oracle's
        // ('0x'||substr(md5(t),1,15))::BIGINT
        var h = 0L
        var k = 0
        while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        h = (h << 4) | ((d(7) & 0xffL) >> 4)
        val bucket = (h % dims).toInt
        raw(bucket) += (if (((h >> 6) & 1L) == 0L) 1.0 else -1.0)
        i = j
      } else i += 1
    }
    var ss = 0.0
    var k = 0
    while (k < dims) { ss += raw(k) * raw(k); k += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) {
      k = 0
      while (k < dims) { raw(k) /= nrm; k += 1 }
    }
    new GenericArrayData(raw)
  }

  /** Column API: featurize a string column into a `dims`-d unit vector. */
  def featurize(text: Column, dims: Int): Column =
    ColumnBridge.column(HashFeaturize(ColumnBridge.expression(text), dims))
}
