package graft

import graft.ops.Orc
import org.apache.spark.sql.functions._

/** ORC roundtrip (q181): content fidelity through the format hop and
  * answer parity with the parquet-side rollup. (The pushdown/pruning
  * contract is hard-asserted inside the query itself.)
  */
class OrcSpec extends SparkSpec {
  import spark.implicits._

  test("ORC write/read preserves the events table row-for-row") {
    val path = Orc.stage(spark, sfDir)
    val a = Tables.events(spark, sfDir)
      .select($"event_id".cast("long"), $"user_id".cast("long"), $"value")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val b = spark.read.orc(path)
      .select($"event_id".cast("long"), $"user_id".cast("long"), $"value")
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("q181 equals the parquet-side rollup") {
    val got = Orc.orcRollup(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val want = Tables.events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .groupBy(($"user_id" % 10).cast("long").as("user_decile"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum($"value".cast("decimal(28,10)")).cast("double"), 2)
          .as("sum_value"))
      .orderBy($"user_decile")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === want)
  }
}
