package graft

import graft.ops.KMeans

/** q239 — tree-vs-flat IVF recall audit (both probe budgets). */
class TreeRecallSpec extends SparkSpec {

  private lazy val rows = KMeans.treeRecall(spark, sfDir).collect()

  test("audit shape: one row per query, k = 3, hits bounded") {
    assert(rows.length === KMeans.AuditQueries)
    rows.foreach { r =>
      assert(r.getLong(1) === 3L)
      Seq(2, 4, 6).foreach(i =>
        assert(r.getLong(i) >= 0L && r.getLong(i) <= 3L))
    }
  }

  test("probe monotonicity: widening the probed leaf set never loses hits") {
    // the equal-fraction probe set is a SUPERSET of the equal-list
    // one (same centroid ranking, larger prefix), and a top-3 over a
    // candidate superset cannot drop an exact-top-3 member without 3
    // strictly better candidates — which would outrank it in the
    // exact scan too
    rows.foreach(r => assert(r.getLong(6) >= r.getLong(4),
      s"q ${r.getLong(0)}: eqf hits ${r.getLong(6)} < list hits ${r.getLong(4)}"))
  }

  test("equal-fraction tree recall matches-or-beats flat at the gate") {
    // measured r15 (sf0.001): flat 24/30, tree@NProbe 21/30 (2 of 12
    // leaves is a smaller corpus fraction than 2 of 10 cells, plus
    // the hierarchical-quantization cost), tree@eqf 26/30 — the
    // fraction-normalized comparison the tuning decision uses
    val flat = rows.map(_.getLong(2)).sum
    val eqf = rows.map(_.getLong(6)).sum
    assert(eqf >= flat, s"tree@eqf $eqf < flat $flat")
  }
}
