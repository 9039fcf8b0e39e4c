package graft

import graft.ops.IncrementalAgg
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (q195): the delta algebra
  * equals a direct recompute over the NEW generation (the
  * materialized-view exactness property), and the maintained plan
  * never aggregates the NEW generation wholesale. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("maintained aggregate equals a direct recompute of the NEW generation") {
    val maintained = IncrementalAgg.maintainedAgg(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    val recomputed = Tables.documents(spark, sfDir)
      .select($"source",
        when(pmod($"doc_id", lit(7)) === 0, concat($"text", lit(" v2")))
          .otherwise($"text").as("text"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length($"text")).cast("long").as("chars_sum"))
      .orderBy($"source")
      .as[(String, Long, Long)].collect().toSeq
    assert(maintained === recomputed)
    assert(maintained.nonEmpty)
  }

  test("the maintained path scans only base + delta slices (pushed predicates)") {
    val plan = IncrementalAgg.maintainedAgg(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    // every documents scan in the maintained plan must carry one of
    // the delta/base predicates; an unfiltered scan would mean the
    // "incremental" path quietly recomputed from scratch
    val filters = Seq(", 5)", ", 13)", ", 7)")
    assert(plan.contains("pmod") && filters.forall(plan.contains),
      s"expected carved predicates in the plan:\n$plan")
    // and the recompute shape (revision applied to ALL rows with no
    // generation predicate anywhere) must be absent: the plan's scan
    // count equals the 4 carved slices, not 1 full pass
    val scans = "Relation".r.findAllIn(plan).size
    assert(scans >= 4, s"expected the 4 carved scans, got $scans:\n$plan")
  }
}
