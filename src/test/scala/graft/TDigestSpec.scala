package graft

import graft.functions.TDigest
import graft.ops.QuantileSketch

/** t-digest contract (q204): rank error within the k₁ size-bound
  * envelope on adversarial-ish distributions, under ANY merge order;
  * state stays compression-bounded. */
class TDigestSpec extends SparkSpec {

  private def digestOf(xs: Seq[Double]): TDigest.Buf =
    xs.foldLeft(TDigest.empty)(TDigest.insert)

  /** Rank-interval distance: a value with duplicates occupies the
    * whole rank span [count(<x), count(≤x)]/n — the error of an
    * estimate is its distance from phi to that INTERVAL (an estimator
    * returning an atom's exact value has zero error for any phi
    * inside the atom's span, however heavy the atom). */
  private def rankErr(sorted: Vector[Double], x: Double, phi: Double): Double = {
    val lo = sorted.count(_ < x).toDouble / sorted.size
    val hi = sorted.count(_ <= x).toDouble / sorted.size
    math.max(0.0, math.max(lo - phi, phi - hi))
  }

  private val phis = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("rank error stays inside the contract on uniform, skewed, and duplicated data") {
    val rnd = new scala.util.Random(3)
    val datasets = Seq(
      ("uniform", Seq.fill(60000)(rnd.nextDouble())),
      ("lognormal", Seq.fill(60000)(math.exp(rnd.nextGaussian() * 2))),
      ("heavy-dup", Seq.fill(60000)(math.floor(rnd.nextDouble() * 20))))
    for ((tag, xs) <- datasets) {
      val d = digestOf(xs)
      val sorted = xs.sorted.toVector
      for (phi <- phis) {
        val est = TDigest.quantile(d, phi)
        val err = rankErr(sorted, est, phi)
        assert(err <= QuantileSketch.RankEps,
          s"$tag phi=$phi est=$est rankErr=$err")
      }
    }
  }

  test("merge order changes the estimate, never the contract") {
    val rnd = new scala.util.Random(9)
    val xs = Seq.fill(40000)(rnd.nextGaussian())
    val sorted = xs.sorted.toVector
    val chunks = xs.grouped(5000).map(digestOf).toSeq
    val fwd = chunks.reduceLeft(TDigest.merge)
    val rev = chunks.reverse.reduceLeft(TDigest.merge)
    for (phi <- phis; d <- Seq(fwd, rev)) {
      val err = rankErr(sorted, TDigest.quantile(d, phi), phi)
      assert(err <= QuantileSketch.RankEps, s"phi=$phi err=$err")
    }
  }

  test("state stays compression-bounded") {
    val rnd = new scala.util.Random(5)
    val d = TDigest.flush(digestOf(Seq.fill(100000)(rnd.nextDouble())))
    assert(d.means.length <= 2 * TDigest.Delta.toInt + 1,
      s"${d.means.length} centroids for delta=${TDigest.Delta}")
    assert(d.nPending === 0)
    // weights conserve the count exactly
    assert(d.weights.sum === 100000.0)
    // centroids stay mean-sorted (the merge invariant)
    assert(d.means.zip(d.means.tail).forall { case (a, b) => a <= b })
  }

  test("q204 runs end-to-end with its in-query contract asserts") {
    val out = QuantileSketch.tdigestAudit(spark, sfDir).collect()
    assert(out.nonEmpty)
    // published percentiles are monotone per group
    for (r <- out)
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4))
  }
}
