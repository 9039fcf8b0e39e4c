package graft

import graft.ops.HllAudit
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** HLL audit (q196): the published counts are the exact distincts
  * (driver replay), and the contract assert actually bites — a
  * deliberately broken bound must fail loudly. */
class HllAuditSpec extends SparkSpec {
  import spark.implicits._

  test("published counts equal a driver replay of exact distincts") {
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"text").as[(String, String)].collect()
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      (src, rows.flatMap(r => r._2.toLowerCase
        .split("[^a-z0-9_]+").filter(_.nonEmpty)).distinct.size.toLong)
    }.toSet
    val got = HllAudit.distinctAudit(spark, sfDir)
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("the sketch actually runs within its configured rsd here") {
    // recompute both sides the way the query does and check the
    // observed error directly — if this drifts past MaxRelErr the
    // declared query fails loudly, which is the designed behavior
    val toks = Tables.documents(spark, sfDir)
      .select($"source", explode(TextOps.tokens($"text")).as("tok"))
    val rows = toks.groupBy($"source")
      .agg(countDistinct($"tok").as("exact"),
        approx_count_distinct($"tok", HllAudit.Rsd).as("approx"))
      .collect()
    rows.foreach { r =>
      val relErr = math.abs(r.getLong(2).toDouble - r.getLong(1)) /
        r.getLong(1).toDouble
      assert(relErr <= HllAudit.MaxRelErr,
        s"${r.getString(0)}: relErr $relErr")
    }
  }
}
