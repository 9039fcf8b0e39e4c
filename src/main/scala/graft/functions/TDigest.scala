package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Merging t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019) from scratch — the mergeable
  * quantile sketch a 100 TB pipeline uses where the exact operators
  * (q46 `percentile`, q101 two-pass exact) would pay a full per-group
  * sort: constant-size state (≤ ~2δ centroids), map-side partial
  * merges, one shuffle row per group.
  *
  * Implemented as a typed [[Aggregator]] (the extension surface §2.J
  * had not yet exercised) and registered through `functions.udaf`.
  * The scale function is the paper's k₁-style size bound
  * `w(c) ≤ 4·N·q(1−q)/δ`: centroid capacity shrinks quadratically
  * toward the tails, which is what makes extreme quantiles (p99)
  * an order of magnitude tighter than the mid-range.
  *
  * Determinism note (why the DECLARED query publishes exact
  * percentiles and only ASSERTS on the sketch): a t-digest estimate
  * depends on merge order, so it varies with partitioning; the rank
  * error does not exceed its bound under ANY order. Same discipline
  * as the HLL audit (q196) — the estimate is engine state, the
  * CONTRACT is the answer.
  */
object TDigest {

  /** Compression: centroid count ≈ 2δ, tail rank error ≈ q(1−q)·4/δ. */
  val Delta = 100.0

  /** Unmerged points buffered per state before an in-place compress. */
  val PendingCap = 512

  /** Digest state: sorted centroids + a PREALLOCATED pending slab
    * filled to `nPending`. The reduce hot path mutates the slab in
    * place and bumps the count — the live buffer object is reused
    * between rows by the aggregation iterator, so per-row work is
    * O(1) with no array copy (serialization through the encoder only
    * happens at partial-output boundaries, where `flush` has already
    * folded the slab away). Arrays (not collections) keep the product
    * encoder compact. */
  case class Buf(means: Array[Double], weights: Array[Double],
      pending: Array[Double], nPending: Int)

  /** Fresh state — allocate a new slab per call (states must never
    * share the mutable buffer). */
  def empty: Buf = Buf(Array.empty, Array.empty,
    new Array[Double](PendingCap), 0)

  def insert(b: Buf, x: Double): Buf = {
    b.pending(b.nPending) = x
    if (b.nPending + 1 >= PendingCap)
      flushInto(b.means, b.weights, b.pending, b.nPending + 1)
    else b.copy(nPending = b.nPending + 1)
  }

  def merge(a: Buf, b: Buf): Buf = {
    val fa = flush(a); val fb = flush(b)
    mergeSorted(fa.means, fa.weights, fb.means, fb.weights)
  }

  /** Fold the pending slab into the centroid list. */
  def flush(b: Buf): Buf =
    if (b.nPending == 0) b
    else flushInto(b.means, b.weights, b.pending, b.nPending)

  private def flushInto(means: Array[Double], weights: Array[Double],
      pending: Array[Double], n: Int): Buf = {
    val p = java.util.Arrays.copyOf(pending, n)
    java.util.Arrays.sort(p)
    mergeSorted(means, weights, p, Array.fill(p.length)(1.0))
  }

  /** One merging pass over two mean-sorted centroid lists, emitting
    * centroids bounded by the k₁-style capacity 4·N·q(1−q)/δ. */
  private def mergeSorted(m1: Array[Double], w1: Array[Double],
      m2: Array[Double], w2: Array[Double]): Buf = {
    val n = m1.length + m2.length
    if (n == 0) return empty
    val ms = new Array[Double](n)
    val ws = new Array[Double](n)
    var i = 0; var j = 0; var k = 0
    while (i < m1.length || j < m2.length) {
      val takeLeft = j >= m2.length || (i < m1.length && m1(i) <= m2(j))
      if (takeLeft) { ms(k) = m1(i); ws(k) = w1(i); i += 1 }
      else { ms(k) = m2(j); ws(k) = w2(j); j += 1 }
      k += 1
    }
    val total = ws.sum
    // Dunning's k₁ scale function: a centroid may span [q0, q2] iff
    // k(q2) − k(q0) ≤ 1 — capacity shrinks toward the tails, and the
    // greedy pass lands at ≈ δ..2δ centroids (the paper's bound; the
    // spec pins ≤ 2δ+1)
    def k1(q: Double): Double =
      Delta / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    val om = new Array[Double](n)
    val ow = new Array[Double](n)
    var out = 0
    var cm = ms(0); var cw = ws(0)
    var before = 0.0 // weight fully emitted so far
    var kLimit = k1(0.0) + 1.0
    var t = 1
    while (t < n) {
      val q2 = (before + cw + ws(t)) / total
      if (k1(q2) <= kLimit) {
        // weighted-mean merge
        cm = (cm * cw + ms(t) * ws(t)) / (cw + ws(t))
        cw += ws(t)
      } else {
        om(out) = cm; ow(out) = cw; out += 1
        before += cw
        kLimit = k1(before / total) + 1.0
        cm = ms(t); cw = ws(t)
      }
      t += 1
    }
    om(out) = cm; ow(out) = cw; out += 1
    Buf(om.take(out), ow.take(out), new Array[Double](PendingCap), 0)
  }

  /** Estimate the φ-quantile: linear interpolation between centroid
    * midpoints on the cumulative-weight axis, clamped to the extreme
    * centroid means at the ends. */
  def quantile(b: Buf, phi: Double): Double = {
    val f = flush(b)
    val m = f.means; val w = f.weights
    require(m.nonEmpty, "quantile of an empty digest")
    val total = w.sum
    val r = phi * total
    var cum = 0.0
    var i = 0
    var prevC = 0.0; var prevM = m(0)
    while (i < m.length) {
      val c = cum + w(i) / 2
      if (r <= c) {
        return if (i == 0 || c == prevC) m(i)
        else prevM + (m(i) - prevM) * (r - prevC) / (c - prevC)
      }
      cum += w(i); prevC = c; prevM = m(i); i += 1
    }
    m.last
  }

  /** Fixed output: the three audited quantiles (struct-encoded). */
  case class Quants(p50: Double, p90: Double, p99: Double)

  /** The typed Aggregator over a double column. */
  object Agg extends Aggregator[Double, Buf, Quants] {
    override def zero: Buf = empty
    override def reduce(b: Buf, a: Double): Buf = insert(b, a)
    override def merge(a: Buf, b: Buf): Buf = TDigest.merge(a, b)
    override def finish(b: Buf): Quants =
      Quants(quantile(b, 0.5), quantile(b, 0.9), quantile(b, 0.99))
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Quants] = Encoders.product[Quants]
  }
}
