package graft

import graft.ops.Planted

/** The SF-proportional planted-offset convention (VERDICT r11 #3):
  * the base rule's arithmetic, its floor (declared SFs keep the
  * historical +100000-family ids byte-identical), its growth (a
  * staged probe corpus can never be guard-bounded again), and the
  * batch-residue property q191's replay contract leans on. */
class PlantedSpec extends SparkSpec {

  test("baseFor: floored at 100000 for every declared SF's id range") {
    // sf0.001/sf0.01 max doc_id = 499, sf0.1 = 4999 — all floor
    assert(Planted.baseFor(499L) === 100000L)
    assert(Planted.baseFor(4999L) === 100000L)
    assert(Planted.baseFor(9999L) === 100000L)
    assert(Planted.baseFor(0L) === 100000L)
  }

  test("baseFor: grows to the next-next power of ten past the floor") {
    // the r11 blocker: staged 30x sf0.1 ids reach 149,999 — the fixed
    // +100000 convention collided; the dynamic rule clears it 66x
    assert(Planted.baseFor(49999L) === 1000000L)
    assert(Planted.baseFor(149999L) === 10000000L)
    assert(Planted.baseFor(99999L) === 1000000L)
    assert(Planted.baseFor(100000L) === 10000000L)
  }

  test("baseFor: always keeps >10x headroom over the organic range") {
    for (mx <- Seq(0L, 9L, 499L, 4999L, 49999L, 149999L, 999999L,
        12345678L))
      assert(Planted.baseFor(mx) > 10 * mx,
        s"base ${Planted.baseFor(mx)} lacks 10x headroom over $mx")
  }

  test("every base is divisible by 4 — q191's batch residues hold") {
    // (slot*B + adj) % 4 == adj % 4 for any rule-produced base, so
    // the stream-dedup families keep their 1/2/0 shifts at any scale
    for (mx <- Seq(499L, 4999L, 49999L, 149999L))
      assert(Planted.baseFor(mx) % 4 === 0L)
  }

  test("familyOffset: slots at the declared SF match the r11 literals") {
    assert(Planted.familyOffset(spark, sfDir, 1, "spec") === 100000L)
    assert(Planted.familyOffset(spark, sfDir, 2, "spec", 1L) === 200001L)
    assert(Planted.familyOffset(spark, sfDir, 4, "spec", 2L) === 400002L)
    assert(Planted.familyOffset(spark, sfDir, 5, "spec") === 500000L)
    assert(Planted.familyOffset(spark, sfDir, 8, "spec") === 800000L)
  }

  test("familyOffset: rejects slots outside the documented decade") {
    intercept[IllegalArgumentException] {
      Planted.familyOffset(spark, sfDir, 0, "spec")
    }
    intercept[IllegalArgumentException] {
      Planted.familyOffset(spark, sfDir, 9, "spec")
    }
    intercept[IllegalArgumentException] {
      Planted.familyOffset(spark, sfDir, 3, "spec", adjust = 8L)
    }
  }

  test("offsetSql renders the identical rule for the oracle") {
    assert(Planted.offsetSql(5).contains("GREATEST(100000"))
    assert(Planted.offsetSql(5).startsWith("(5 * "))
    assert(Planted.offsetSql(2, 1L).endsWith("+ 1)"))
    // the SQL derives digits from MAX(doc_id) over the same table the
    // Scala side scans
    assert(Planted.baseSqlExpr.contains("SELECT MAX(doc_id) FROM documents"))
  }
}
