package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximation (A2's scale path: exact countDistinct
  * is a full shuffle of the key; approx_count_distinct is a fixed-
  * size HLL merged map-side). The approximation contract is checked
  * here; exact variants stay in the oracle-verified queries.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on domains and users") {
    val wp = Corpus.webPages(spark, sfDir)
    val exact = wp.select(countDistinct($"domain")).as[Long].head()
    val approx = wp.select(approx_count_distinct($"domain")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)

    val e = Tables.events(spark, sfDir)
    val exactU = e.select(countDistinct($"user_id")).as[Long].head()
    val approxU = e.select(approx_count_distinct($"user_id")).as[Long].head()
    assert(math.abs(approxU - exactU).toDouble / exactU <= 0.05)
  }

  test("approximate quantiles bracket the exact median") {
    val e = Tables.events(spark, sfDir)
    val Array(q25, q50, q75) =
      e.stat.approxQuantile("value", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 <= q50 && q50 <= q75)
    val exactSorted = e.select($"value").as[Double].collect().sorted
    val median = exactSorted(exactSorted.length / 2)
    assert(math.abs(q50 - median) / math.max(median, 1.0) <= 0.05)
  }
}
