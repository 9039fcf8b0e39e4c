package graft

import graft.ops.Erasure
import org.apache.spark.sql.functions._

/** Erasure cascade (q199): driver replay of every audit row, the
  * cascade really follows the key graph (lineitem deletions equal
  * the erased orders' lineitems), and the zero-orphan invariant. */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  test("audit matches a driver replay; cascade follows the key graph") {
    val rows = Erasure.erasureAudit(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey").as[Long].collect()
    val ords = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey").as[(Long, Long)].collect()
    val lis = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey").as[Long].collect()
    val evs = Tables.events(spark, sfDir)
      .select($"user_id").as[Long].collect()
    val k = Erasure.SubjectEvery
    val erasedOrders = ords.filter(_._2 % k == 0).map(_._1).toSet
    assert(rows("customer") == (cust.length.toLong,
      cust.count(_ % k == 0).toLong,
      (cust.length - cust.count(_ % k == 0)).toLong, 0L))
    assert(rows("orders") == (ords.length.toLong,
      ords.count(_._2 % k == 0).toLong,
      (ords.length - ords.count(_._2 % k == 0)).toLong, 0L))
    assert(rows("events") == (evs.length.toLong,
      evs.count(_ % k == 0).toLong,
      (evs.length - evs.count(_ % k == 0)).toLong, 0L))
    val liDel = lis.count(erasedOrders.contains).toLong
    assert(rows("lineitem") == (lis.length.toLong, liDel,
      lis.length - liDel, 0L))
    assert(liDel > 0, "the cascade path must actually erase something")
  }
}
