package graft

import graft.ops.{Curation, Skyline}

/** Skyline contract (q207): the bucketed prefix-scan decomposition ≡
  * the brute-force dominance definition, bucket-count invariance, and
  * the classic edge cases (duplicates survive, per-axis ties). */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def frontierSet(pts: org.apache.spark.sql.DataFrame, b: Int) =
    Skyline.frontierOf(pts, b).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def bruteForce(
      pts: Seq[(Long, String, Long, Double)]): Set[(Long, String, Long, Double)] =
    pts.filterNot { case (_, _, c, s) =>
      pts.exists { case (_, _, c2, s2) =>
        s2 >= s && c2 <= c && (s2 > s || c2 < c) }
    }.toSet

  test("bucketed frontier equals brute-force dominance on real data") {
    val ptsDf = Curation.scoredPoints(spark, sfDir).localCheckpoint()
    val pts = ptsDf.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // collect() column order: doc_id, source, n_chars, score
    val want = bruteForce(pts.toSeq)
    assert(frontierSet(ptsDf, Skyline.NBuckets) === want)
    assert(want.nonEmpty)
  }

  test("the answer is bucket-count invariant") {
    val ptsDf = Curation.scoredPoints(spark, sfDir).localCheckpoint()
    val base = frontierSet(ptsDf, Skyline.NBuckets)
    assert(frontierSet(ptsDf, 1) === base,
      "one bucket (pure within-bucket path) must agree")
    assert(frontierSet(ptsDf, 7) === base)
    assert(frontierSet(ptsDf, 1000) === base,
      "many buckets (pure cross-bucket path) must agree")
  }

  test("duplicate points are all kept; dominated points drop") {
    val pts = Seq(
      (1L, "a", 100L, 0.9),  // frontier
      (2L, "a", 100L, 0.9),  // exact duplicate — must survive too
      (3L, "a", 50L, 0.5),   // frontier (cheaper)
      (4L, "a", 120L, 0.8),  // dominated by 1 (worse on both)
      (5L, "a", 100L, 0.8),  // dominated by 1 (same cost, lower score)
      (6L, "a", 120L, 0.9)   // dominated by 1 (same score, higher cost)
    ).toDF("doc_id", "source", "n_chars", "score")
    val got = frontierSet(pts, 4)
    assert(got.map(_._1) === Set(1L, 2L, 3L))
  }

  test("per-axis tie handling: strictness is required for domination") {
    val pts = Seq(
      (1L, "a", 10L, 0.5),
      (2L, "a", 10L, 0.5),   // identical — both stay
      (3L, "a", 10L, 0.7),   // dominates 1,2 on score at equal cost
      (4L, "a", 5L, 0.5)     // dominates 1,2 on cost at equal score
    ).toDF("doc_id", "source", "n_chars", "score")
    assert(frontierSet(pts, 3).map(_._1) === Set(3L, 4L))
  }
}
