package graft

import graft.ops.Luhn
import org.apache.spark.sql.functions._

/** Luhn validator contract (q203): known checksum vectors (ISO/IEC
  * 7812-1 §B), odd/even length parity, and the audit's internal
  * arithmetic. */
class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def valid(nums: Seq[String]): Seq[Boolean] =
    nums.toDF("cand").select(Luhn.luhnValid(col("cand"))).as[Boolean].collect().toSeq

  test("known Luhn vectors validate correctly") {
    // classic published examples: 79927398713 is THE worked example
    // (check digit 3); 4532015112830366 is a valid test PAN shape
    assert(valid(Seq("79927398713")) === Seq(true))
    assert(valid(Seq("79927398710", "79927398711", "79927398712",
      "79927398714")) === Seq(false, false, false, false))
    assert(valid(Seq("4532015112830366")) === Seq(true))
    assert(valid(Seq("4532015112830367")) === Seq(false))
  }

  test("odd/even length parity: doubling is anchored at the RIGHT end") {
    // "18": payload 1 (doubled: 2), check 8 → 10 ≡ 0 valid
    // "118": leading digit shifts parity — payload 11, doubled digit
    // is now the middle 1 → 1+2+8 = 11, invalid
    assert(valid(Seq("18", "118")) === Seq(true, false))
    // prepending a 0 must NEVER flip validity (0 doubles to 0)
    assert(valid(Seq("018", "0018")) === Seq(true, true))
  }

  test("q203 audit counts are internally consistent and match the staging") {
    val out = Luhn.luhnAudit(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq === out.map(_.getString(0)).toSeq.sorted)
    for (r <- out) {
      assert(r.getLong(2) === r.getLong(3) + r.getLong(4),
        "candidates must split exactly into valid + invalid")
      assert(r.getLong(2) <= r.getLong(1))
    }
    // global candidate count == orders with a staged number (key % 5 != 0)
    val wantCands = Tables.orders(spark, sfDir)
      .filter(pmod(col("o_orderkey"), lit(5)) =!= 0).count()
    assert(out.map(_.getLong(2)).sum === wantCands)
    assert(out.map(_.getLong(1)).sum ===
      Tables.orders(spark, sfDir).count())
    // the checksum actually discriminates: both classes present
    assert(out.map(_.getLong(3)).sum > 0, "some staged numbers are Luhn-valid")
    assert(out.map(_.getLong(4)).sum > 0, "most staged numbers are not")
  }
}
