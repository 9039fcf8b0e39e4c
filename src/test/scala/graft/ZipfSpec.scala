package graft

import graft.ops.Zipf

/** q234 — Zipf/Heaps vocabulary-law audit. */
class ZipfSpec extends SparkSpec {

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  // non-finite passthrough: Spark's round and DuckDB's ROUND both
  // return NaN/Inf unchanged (the degenerate-fit case — a constant
  // cum_v series makes r² = 0/0 on the closed-vocabulary gate corpus)
  private def rnd(x: Double, s: Int) =
    if (!java.lang.Double.isFinite(x)) x
    else BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def eq(a: Double, b: Double): Boolean =
    a == b || (a.isNaN && b.isNaN)

  private def ols(pts: Seq[(Double, Double)]): (Double, Double) = {
    val n = pts.length.toDouble
    // each term quantizes to 12 dp first — the op's DECIMAL(28,12)
    // cast does, and on degenerate (constant-y) fits the sub-1e-12
    // bits decide whether the moments cancel exactly or leave ulp
    // residue (0.0-vs-NaN r² at the gate corpus)
    def dsum(vs: Seq[Double]) = vs
      .map(BigDecimal(_).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val sx = dsum(pts.map(_._1)); val sy = dsum(pts.map(_._2))
    val sxx = dsum(pts.map(p => p._1 * p._1))
    val sxy = dsum(pts.map(p => p._1 * p._2))
    val syy = dsum(pts.map(p => p._2 * p._2))
    val cov = n * sxy - sx * sy
    (rnd(cov / (n * sxx - sx * sx), 6),
      rnd(cov * cov / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6))
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
    assert(out.getLong(0) == vocab.size.toLong)
    assert(out.getLong(1) == vocab.map(_._2).sum)
    assert(eq(out.getDouble(2), zs), s"zipf_slope ${out.getDouble(2)} != $zs")
    assert(eq(out.getDouble(3), zr), s"zipf_r2 ${out.getDouble(3)} != $zr")
    assert(eq(out.getDouble(4), hs), s"heaps_beta ${out.getDouble(4)} != $hs")
    assert(eq(out.getDouble(5), hr), s"heaps_r2 ${out.getDouble(5)} != $hr")
  }
}
