package graft

import graft.ops.{Dedup, MinHashAudit}
import org.apache.spark.sql.functions._

/** MinHash estimator-audit contract (q217): signature path replayed
  * from the LCG definition on crafted shingle sets, census structure,
  * and the documented low-band selection bias. */
class MinHashAuditSpec extends SparkSpec {
  import spark.implicits._

  /** Driver twin of the 16-permutation signature. */
  private def sigOf(sh: Seq[Long]): Seq[Long] =
    Dedup.minhashCoeffs.map { case (a, b) =>
      sh.map(x => (a * (x % Dedup.P31) + b) % Dedup.P31).min
    }

  test("engine signatures match the LCG definition on crafted sets") {
    val docs = Seq(
      (1L, (1L to 100L).toArray),
      (2L, ((1L to 50L) ++ (201L to 250L)).toArray),  // J(1,2) = 1/3
      (3L, (1L to 100L).toArray))                      // J(1,3) = 1
    val signed = Dedup.signedOf(docs.toDF("doc_id", "sh"))
      .collect().map(r => r.getLong(0) ->
        (0 until MinHashAudit.Components).map(i => r.getLong(2 + i))).toMap
    for ((id, sh) <- docs)
      assert(signed(id) === sigOf(sh.toSeq), s"signature of doc $id")
    // identical sets → identical signatures → estimator says 1
    assert(signed(1L) === signed(3L))
    // the estimator tracks the true J within binomial noise
    val est12 = signed(1L).zip(signed(2L)).count { case (x, y) => x == y }
      .toDouble / MinHashAudit.Components
    assert(math.abs(est12 - 1.0 / 3.0) <= 0.25,
      s"estimate $est12 should be within noise of 1/3")
  }

  test("q217 census structure, contract region, and selection bias") {
    val out = MinHashAudit.estimatorAudit(spark, sfDir).collect()
    assert(out.nonEmpty)
    // columns: band(0), n_pairs(1), mean_est(2), mean_exact(3),
    // mean_abs_err(4), max_abs_err(5)
    for (r <- out) {
      assert(r.getInt(0) >= 0 && r.getInt(0) <= 9)
      assert(r.getLong(1) >= 1)
      assert(r.getDouble(4) <= r.getDouble(5) + 1e-9,
        "mean |err| cannot exceed max |err|")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      // the query itself hard-asserts the contract on populated
      // high bands; re-check here so a weakened query fails the spec
      if (r.getInt(0) >= MinHashAudit.ContractBandMin
          && r.getLong(1) >= MinHashAudit.MinBandN) {
        assert(r.getDouble(4) <= MinHashAudit.MaxMeanAbsErr)
        assert(math.abs(r.getDouble(2) - r.getDouble(3))
          <= MinHashAudit.MaxBias)
      }
      // low bands exist only through a chance band match, which
      // forces >= 4/16 components equal — estimates inflate UP
      if (r.getInt(0) <= 2 && r.getLong(1) >= MinHashAudit.MinBandN)
        assert(r.getDouble(2) > r.getDouble(3),
          s"band ${r.getInt(0)}: candidate conditioning must inflate the estimate")
    }
  }
}
