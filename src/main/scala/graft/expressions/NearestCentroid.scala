package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native k-means assignment step: nearest centroid by rounded true
  * L2, the argmin the `crossJoin(broadcast(cents)) → min_by` shape
  * computes relationally. The relational shape materializes one
  * joined row PER (vector, centroid) — n·K rows each carrying the
  * 8 KB vector payload through the join and the partial aggregate —
  * so its cost grows with K even though only one row per vector
  * survives. At the production operating point (lists ∝ corpus, the
  * pgvector ivfflat rule) that blowup is the assignment bottleneck;
  * this expression walks the broadcast centroid array ONCE per row
  * in a generated-code static call and emits just the winning cid.
  *
  * Bit-parity contract with [[graft.ops.KMeans]]'s relational step
  * (pinned by NearestCentroidSpec): distance =
  * `round(xx - 2.0·dot(v, cv) + cc, 9)` with the same left-to-right
  * double accumulation as [[DotProduct]], the same
  * `BigDecimal.valueOf(..).setScale(9, HALF_UP)` rounding Spark's
  * `round` applies to doubles, and the same (dist, cid) lexicographic
  * tie-break as `min_by(cid, struct(dist, cid))` — order-independent
  * over the centroid array, so `collect_list`'s nondeterministic
  * ordering cannot change the answer.
  *
  * Dimension mismatches throw loudly (the relational shape's NULL
  * dist would silently drop the pair from `min_by`; a model/corpus
  * width mismatch is always a bug).
  */
case class NearestCentroid(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val centsOk = third.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, IntegerType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _),
        StructField(_, DoubleType, _, _))), _) => true
      case _ => false
    }
    if (vOk && second.dataType == DoubleType && centsOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid requires (array<double>, double, " +
        s"array<struct<cid:int,cv:array<double>,cc:double>>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }

  override def nullSafeEval(v: Any, xx: Any, cents: Any): Any =
    NearestCentroid.nearest(v.asInstanceOf[ArrayData],
      xx.asInstanceOf[Double], cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // the K·d loop lives in a static helper; generated code stays a
    // one-line call, so the surrounding stage remains codegen'd
    defineCodeGen(ctx, ev, (v, xx, cents) =>
      s"graft.expressions.NearestCentroid.nearest($v, $xx, $cents)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestCentroid =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  /** Identical to Spark's `round(x, 9)` on doubles — including the
    * non-finite passthrough (`BigDecimal.valueOf` would throw on
    * NaN/Infinity where Spark's round returns them unchanged). */
  @inline private def round9(x: Double): Double =
    if (java.lang.Double.isFinite(x))
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    else x

  /** Argmin centroid id. Called from generated code — keep it a
    * plain public static-forwarding method. */
  def nearest(v: ArrayData, xx: Double, cents: ArrayData): Int = {
    val k = cents.numElements()
    require(k > 0, "nearest_centroid: empty centroid array")
    val dims = v.numElements()
    var bestDist = Double.PositiveInfinity
    var bestCid = Int.MaxValue
    var best = false
    var i = 0
    // a null VECTOR element is always corrupt input — fail loudly
    // (the relational shape would NULL every distance and emit a
    // null cid; silence is the wrong answer for a broken corpus)
    while (i < dims) {
      require(!v.isNullAt(i), s"nearest_centroid: null vector element at $i")
      i += 1
    }
    i = 0
    while (i < k) {
      val c = cents.getStruct(i, 3)
      val cid = c.getInt(0)
      val cv = c.getArray(1)
      require(cv.numElements() == dims,
        s"nearest_centroid: centroid $cid has ${cv.numElements()} dims, vector has $dims")
      // a null CENTROID element NULLs the relational distance and
      // min_by drops the pair — skip the centroid for parity
      var nullElem = false
      var dot = 0.0
      var j = 0
      while (j < dims && !nullElem) {
        if (cv.isNullAt(j)) nullElem = true
        else { dot += v.getDouble(j) * cv.getDouble(j); j += 1 }
      }
      if (!nullElem) {
        val dist = round9(xx - 2.0 * dot + c.getDouble(2))
        // Double.compare = Spark/min_by total ordering (NaN greater
        // than every double, NaN == NaN) — plain < / == would let a
        // NaN dist win permanently and make the result depend on
        // centroid order, breaking the claimed min_by bit-parity
        val cmp = if (best) java.lang.Double.compare(dist, bestDist) else -1
        if (cmp < 0 || (cmp == 0 && cid < bestCid)) {
          best = true; bestDist = dist; bestCid = cid
        }
      }
      i += 1
    }
    require(best, "nearest_centroid: every centroid had null elements")
    bestCid
  }

  /** Column API. */
  def nearestCentroid(v: Column, xx: Column, cents: Column): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v),
      ColumnBridge.expression(xx), ColumnBridge.expression(cents)))
}
