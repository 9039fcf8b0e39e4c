package graft

import graft.ops.Zipf

/** q234 — Zipf/Heaps vocabulary-law audit. */
class ZipfSpec extends SparkSpec {

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  private def rnd(x: Double, s: Int) =
    if (!java.lang.Double.isFinite(x)) x
    else BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eq(a: Option[Double], b: Option[Double]): Boolean =
    (a, b) match {
      case (Some(x), Some(y)) => x == y || (x.isNaN && y.isNaN)
      case (None, None)       => true
      case _                  => false
    }

  // mirrors Zipf.slopeR2 incl. the q208 degenerate-variance
  // convention: zero varX or varY (the closed-vocabulary gate
  // corpus's flat head / exhausted decile curve) publishes NULL fits
  // instead of a signed-zero-residual slope (r13 hash-gate lesson)
  private def ols(pts: Seq[(Double, Double)]): (Option[Double], Option[Double]) = {
    val n = pts.length.toDouble
    // each term quantizes to 12 dp first — the op's DECIMAL(28,12)
    // cast does, and on degenerate (constant-y) fits the sub-1e-12
    // bits decide whether the moments cancel exactly or leave ulp
    // residue
    def dsum(vs: Seq[Double]) = vs
      .map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val sx = dsum(pts.map(_._1)); val sy = dsum(pts.map(_._2))
    val sxx = dsum(pts.map(p => p._1 * p._1))
    val sxy = dsum(pts.map(p => p._1 * p._2))
    val syy = dsum(pts.map(p => p._2 * p._2))
    val cov = n * sxy - sx * sy
    val varX = n * sxx - sx * sx
    val varY = n * syy - sy * sy
    if (varX == 0.0 || varY == 0.0) (None, None)
    else (Some(rnd(cov / varX, 6)), Some(rnd(cov * cov / (varX * varY), 6)))
  }

  test("slope/r2 match a from-scratch replay with the op's rounding ladder") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok(r.getString(1)))
    val span = docs.map(_._1).max + 1
    val vocab = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1)
      .map { case (t, g) => (t, g.length.toLong, g.map(_._2).min) }
      .toSeq
    val head = vocab.sortBy { case (t, f, _) => (-f, t) }.take(Zipf.ZipfTopR)
    val zPts = head.zipWithIndex.map { case ((_, f, _), i) =>
      (rnd(math.log((i + 1).toDouble), 9), rnd(math.log(f.toDouble), 9)) }
    val (zs, zr) = ols(zPts)
    val newV = vocab.groupBy { case (_, _, fd) => fd * 10 / span }
      .map { case (d, g) => d -> g.size.toLong }
    val decTok = docs.groupBy { case (id, _) => id * 10 / span }
      .map { case (d, g) => d -> g.map(_._2.length.toLong).sum }
    val decs = decTok.keys.toSeq.sorted
    val hPts = decs.scanLeft((0L, 0L)) { case ((cn, cv), d) =>
      (cn + decTok(d), cv + newV.getOrElse(d, 0L)) }.drop(1)
      .map { case (cn, cv) =>
        (rnd(math.log(cn.toDouble), 9), rnd(math.log(cv.toDouble), 9)) }
    val (hs, hr) = ols(hPts)
    val out = Zipf.zipfHeaps(spark, sfDir).head
    def opt(i: Int): Option[Double] =
      if (out.isNullAt(i)) None else Some(out.getDouble(i))
    assert(out.getLong(0) == vocab.size.toLong)
    assert(out.getLong(1) == vocab.map(_._2).sum)
    assert(eq(opt(2), zs), s"zipf_slope ${opt(2)} != $zs")
    assert(eq(opt(3), zr), s"zipf_r2 ${opt(3)} != $zr")
    assert(eq(opt(4), hs), s"heaps_beta ${opt(4)} != $hs")
    assert(eq(opt(5), hr), s"heaps_r2 ${opt(5)} != $hr")
  }

  test("published fits never carry a negative-zero bit pattern") {
    // r13 gate failure: the near-flat Heaps curve left cov as a
    // sub-rounding residual, ROUND(cov/varX, 6) landed on a signed
    // zero, and the two engines disagreed on the sign (driver hashes
    // bits). The op now guards exact degeneracy with NULL and
    // normalizes -0.0 → 0.0 with `+ 0.0`; this pins the bit pattern.
    val out = Zipf.zipfHeaps(spark, sfDir).head
    for (i <- 2 to 5 if !out.isNullAt(i)) {
      val v = out.getDouble(i)
      assert(!(v == 0.0 && java.lang.Double.doubleToRawLongBits(v) != 0L),
        s"column $i published -0.0")
    }
  }
}
