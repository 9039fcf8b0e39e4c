package graft

/** The tier table's coverage contract (VERDICT r11 #6): every
  * declared query is either certified (mechanically, from a canonical
  * record — see [[graft.tools.GenBenchTiers]]) or explicitly new this
  * round (→ SOLO protocol, the safe default). A rename, a dropped
  * query, or a hand-edit that breaks coverage fails here instead of
  * silently mis-tiering a bench row. */
class BenchTiersSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val declared =
    SparkEntry.queries.keys.map(_.takeWhile(_ != '_')).toSet

  test("every declared query is certified or declared new-this-round") {
    val covered = BenchTiers.certifiedSteady.keySet ++ BenchTiers.newThisRound
    val missing = declared.diff(covered)
    assert(missing.isEmpty,
      s"un-tiered queries (regenerate BenchTiers): ${missing.toSeq.sorted}")
  }

  test("no stale certified entries for undeclared queries") {
    val stale = BenchTiers.certifiedSteady.keySet.diff(declared)
    assert(stale.isEmpty,
      s"certified entries without a declared query: ${stale.toSeq.sorted}")
  }

  test("newThisRound names only declared, uncertified queries") {
    assert(BenchTiers.newThisRound.subsetOf(declared))
    val both = BenchTiers.newThisRound
      .intersect(BenchTiers.certifiedSteady.keySet)
    assert(both.isEmpty, s"queries both certified and new: ${both.toSeq.sorted}")
  }

  test("certified values are positive idle seconds") {
    BenchTiers.certifiedSteady.foreach { case (q, v) =>
      assert(v > 0 && v < 120, s"$q certified $v outside sane idle range")
    }
  }
}
