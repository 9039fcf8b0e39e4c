package graft

import graft.ops.Segment
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parity gate for [[graft.ops.Segment.distributedNtile]] (r16): the
  * two-phase rank + closed-form bucketing must equal Spark's own
  * `ntile(n).over(Window.orderBy(…))` row for row — q131's oracle
  * hash depends on the tiling being identical — including every
  * N % n residue (the first N%n buckets are one row larger, the rule
  * the closed form re-implements).
  */
class NtileParitySpec extends SparkSpec {
  import spark.implicits._

  test("distributedNtile ≡ ntile window on every N % 10 residue") {
    // sizes straddling n (buckets-of-one), the residue wrap, and a
    // multi-partition size; keys shuffled so ranks ≠ input order
    for (n <- Seq(1, 3, 7, 9, 10, 11, 25, 103, 1000)) {
      val rows = (0 until n)
        .map(i => ((i * 7919) % 104729, i.toLong)).toDF("k", "id")
        .repartition(5)
      val dist = Segment.distributedNtile(rows, 10,
        Seq(col("k"), col("id")), "b")
        .select($"id", $"b").as[(Long, Int)].collect().toMap
      val win = rows.withColumn("b",
        ntile(10).over(Window.orderBy(col("k"), col("id"))))
        .select($"id", $"b").as[(Long, Int)].collect().toMap
      assert(dist === win, s"ntile diverges at N=$n")
    }
  }

  test("distributedNtile ≡ ntile window on the real q131 relation, both orders") {
    val rfm = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("frequency"),
        max(col("o_orderdate")).as("lastd"))
    val descCols = Seq(col("frequency").desc, col("o_custkey"))
    val ascCols = Seq(col("lastd"), col("o_custkey"))
    for (cols <- Seq(descCols, ascCols)) {
      val dist = Segment.distributedNtile(rfm, 10, cols, "b")
        .select(col("o_custkey"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val win = rfm.withColumn("b", ntile(10).over(Window.orderBy(cols: _*)))
        .select(col("o_custkey"), col("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(dist === win, s"ntile diverges on the rfm relation ($cols)")
    }
  }
}
