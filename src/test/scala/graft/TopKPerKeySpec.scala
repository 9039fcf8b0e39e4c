package graft

import graft.functions.VectorOps
import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def scored = {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.dot(col("embedding"), col("q_emb")), 9).as("sim"))
  }

  test("custom operator matches the window row_number formulation") {
    val viaWindow = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy($"q_id").orderBy($"sim".desc, $"vec_id")))
      .filter($"rn" <= 3).drop("rn")
      .select("q_id", "vec_id", "sim")
      .orderBy("q_id", "vec_id").collect().toSeq
    val viaOperator = TopKPerKey.perKey(scored, Seq("q_id"), "sim", 3)
      .select("q_id", "vec_id", "sim")
      .orderBy("q_id", "vec_id").collect().toSeq
    // heap ties on equal sim may keep a different row than the
    // vec_id-tiebroken window — compare (q_id, sim) multiset first,
    // and exact rows when sims are distinct
    assert(viaOperator.map(r => (r.getLong(0), r.getDouble(2))).sorted ===
      viaWindow.map(r => (r.getLong(0), r.getDouble(2))).sorted)
  }

  test("plan contains the custom exec and a key-hash exchange, no sort") {
    val df = TopKPerKey.perKey(scored, Seq("q_id"), "sim", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    assert(plan.contains("hashpartitioning(q_id"),
      s"no key distribution requirement:\n$plan")
    assert(!plan.contains("Sort [sim"), s"unexpected sort:\n$plan")
  }

  test("same-key aggregation above the operator reuses its partitioning") {
    val agg = TopKPerKey.perKey(scored, Seq("q_id"), "sim", 3)
      .groupBy("q_id").agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(q_id".r
      .findAllIn(plan).size
    val plans = "TopKPerKey".r.findAllIn(plan).size
    // one exchange per printed plan copy (AQE prints final+initial):
    // the exec preserves child partitioning, so the aggregation above
    // must NOT re-shuffle on the same key
    assert(exchanges <= plans, s"redundant exchange above TopKPerKey:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val df = TopKPerKey.perKey(scored.filter($"vec_id" < 8),
      Seq("q_id"), "sim", 1000)
    assert(df.count() === scored.filter($"vec_id" < 8).count())
  }

  test("ambiguous column names fail instead of binding the first match") {
    val dup = scored.select($"q_id", $"sim")
      .crossJoin(scored.select($"sim").limit(1))
    val e = intercept[Exception] {
      TopKPerKey.perKey(dup, Seq("q_id"), "sim", 3).collect()
    }
    assert(e.getMessage.contains("ambiguous") ||
      e.getCause != null && e.getCause.getMessage.contains("ambiguous"))
  }

  test("long order columns above 2^53 keep full precision") {
    val big = (1L << 53) // 2^53: +1 and +2 collapse in double
    val df = Seq(("a", big + 1), ("a", big + 2), ("a", big)).toDF("k", "v")
    val top = TopKPerKey.perKey(df, Seq("k"), "v", 2)
      .select("v").as[Long].collect().toSet
    assert(top === Set(big + 2, big + 1))
  }

  test("ascending mode keeps the smallest scores") {
    val asc = TopKPerKey.perKey(scored, Seq("q_id"), "sim", 2, desc = false)
      .groupBy("q_id").agg(max($"sim").as("worst"))
    val globalMax = scored.groupBy("q_id").agg(max($"sim").as("best"))
    val joined = asc.join(globalMax, "q_id")
      .filter($"worst" >= $"best").count()
    assert(joined === 0)
  }
}
