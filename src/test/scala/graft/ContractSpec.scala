package graft

import graft.ops.Contract
import org.apache.spark.sql.functions._

/** Data-contract validation (q186): the report matches a driver
  * replay of each rule, the fixture star schema is internally
  * consistent (every rule passes — the contract the generator
  * guarantees), and the per-table rule families stay single-scan. */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  test("report matches a driver replay of every rule") {
    val orders = Tables.orders(spark, sfDir).collect()
    val customer = Tables.customer(spark, sfDir)
      .select($"c_custkey").as[Long].collect().toSet
    val lineitem = Tables.lineitem(spark, sfDir).collect()
    val okeys = orders.map(_.getAs[Long]("o_orderkey")).toSet
    val expected = Map(
      "orders.o_custkey_not_null" ->
        orders.count(_.isNullAt(1)).toLong,
      "orders.o_orderkey_unique" ->
        (orders.length - okeys.size).toLong,
      "orders.o_orderstatus_accepted" ->
        orders.count(r => !Set("O", "F", "P")
          .contains(r.getAs[String]("o_orderstatus"))).toLong,
      "orders.o_totalprice_positive" ->
        orders.count(_.getAs[Double]("o_totalprice") <= 0.0).toLong,
      "lineitem.l_quantity_in_1_50" ->
        lineitem.count { r => val q = r.getAs[Double]("l_quantity")
          q < 1.0 || q > 50.0 }.toLong,
      "lineitem.l_discount_in_0_0.1" ->
        lineitem.count { r => val d = r.getAs[Double]("l_discount")
          d < 0.0 || d > 0.1 }.toLong,
      "lineitem.l_extendedprice_positive" ->
        lineitem.count(_.getAs[Double]("l_extendedprice") <= 0.0).toLong,
      "orders.o_custkey_ref_customer" ->
        orders.count(r => !customer.contains(r.getAs[Long]("o_custkey"))).toLong,
      "lineitem.l_orderkey_ref_orders" ->
        lineitem.count(r => !okeys.contains(r.getAs[Long]("l_orderkey"))).toLong)
    val got = Contract.validate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(got == expected)
    // passed flag is derived, never asserted independently of counts
    Contract.validate(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Boolean]("passed") == (r.getAs[Long]("n_violations") == 0L))
    }
  }

  test("rule families are single-scan: one orders leaf, one lineitem leaf in the agg branches") {
    // each per-table rule family must compile to ONE aggregate over
    // ONE scan (adding a rule must not add a pass); the referential
    // rules add their own scans by necessity (join + count)
    val plan = Contract.validate(spark, sfDir).queryExecution.optimizedPlan
    def leaves(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectLeaves().size
    // 4 unions: ordersRules(1 scan) + lineitemRules(1) + refOrders(2+1)
    // + refLines(2+1) → 8 relation leaves total; a per-rule rescan
    // would multiply the first two families
    assert(leaves(plan) <= 8,
      s"rule sweep must stay single-scan per table, got ${leaves(plan)} leaves")
  }
}
