package graft

import graft.ops.AqeDemote
import org.apache.spark.sql.functions._

/** AQE join demotion (q192): answer parity with the plain unscoped
  * join (strategy choice is answer-invariant), the in-query initial-
  * SMJ/final-broadcast asserts (they ran ⇒ the demotion happened),
  * and conf hygiene. */
class AqeDemoteSpec extends SparkSpec {
  import spark.implicits._

  test("demoted answer equals the plain unscoped join") {
    val got = AqeDemote.demotedJoinRollup(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .filter($"o_orderpriority" === AqeDemote.Priority),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        round(sum(($"l_extendedprice" * (lit(1) - $"l_discount"))
          .cast("decimal(28,10)")).cast("double"), 2).as("revenue"))
      .orderBy($"o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === plain)
    assert(got.nonEmpty)
  }

  test("scoped thresholds are restored after the query") {
    // the operator's OWN scoped-conf list (not a hand-copied subset)
    val keys = AqeDemote.ScopedConfs.map(_._1)
    val before = keys.map(k => k -> spark.conf.getOption(k))
    AqeDemote.demotedJoinRollup(spark, sfDir).collect()
    val after = keys.map(k => k -> spark.conf.getOption(k))
    assert(after === before, "q192 must not leak its scoped confs")
  }
}
