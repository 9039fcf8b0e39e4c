package graft

import graft.ops.{Audit, KMeans, Similarity}
import org.apache.spark.sql.functions._

/** Semantic guarantees of the self-audit suite (q119-q122). */
class AuditSpec extends SparkSpec {

  test("ann recall: replays from the two ANN outputs; bounded by k") {
    val exact = Similarity.knnBruteForce(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val ivf = Similarity.knnIvf(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val livf = KMeans.knnIvfKmeans(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val rows = Audit.annRecall(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("q_id")).toSet == exact.keySet)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val k = r.getAs[Long]("k")
      assert(k == exact(q).size.toLong)
      assert(r.getAs[Long]("hits_ivf") ==
        exact(q).intersect(ivf.getOrElse(q, Set.empty)).size.toLong)
      assert(r.getAs[Long]("hits_livf") ==
        exact(q).intersect(livf.getOrElse(q, Set.empty)).size.toLong)
      assert(r.getAs[Double]("recall_ivf") >= 0.0
        && r.getAs[Double]("recall_ivf") <= 1.0)
    }
  }

  test("skew audit: stats replay from per-key counts") {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val row = Audit.skewAudit(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_keys") == counts.length.toLong)
    assert(row.getAs[Long]("n_rows") == counts.map(_._2).sum)
    assert(row.getAs[Long]("max_cnt") == counts.map(_._2).max)
    val top10 = counts.sortBy { case (k, c) => (-c, k) }.take(10)
      .map(_._2).sum.toDouble
    assert(math.abs(row.getAs[Double]("top10_share")
      - top10 / counts.map(_._2).sum) < 1e-6)
    assert(row.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("split assign: content-stable, fractions partition each source") {
    val rows = Audit.splitAssign(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val fr = rs.map(_.getAs[Double]("frac")).sum
      assert(math.abs(fr - 1.0) < 1e-5, s"$src fractions sum to $fr")
      assert(rs.map(_.getAs[String]("split")).distinct.length == rs.length)
    }
    assert(rows.map(_.getAs[String]("split")).toSet.subsetOf(
      Set("train", "val", "test")))
    // rerun must produce the identical assignment (hash, not random)
    val again = Audit.splitAssign(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
    // the hash rule itself: replay one bucket in the driver
    val md = java.security.MessageDigest.getInstance("MD5")
    val doc0 = Tables.documents(spark, sfDir).select(col("doc_id"))
      .orderBy(col("doc_id")).limit(1).collect().head.getLong(0)
    val hex = md.digest(s"split$doc0".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val bucket = java.lang.Long.parseLong(hex, 16) % 100
    val expected = if (bucket < Audit.TrainPct) "train"
      else if (bucket < Audit.ValPct) "val" else "test"
    val got = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === doc0)
      .select(col("source")).collect().head.getString(0)
    val splitOfDoc0 = {
      import spark.implicits._
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          pmod(graft.functions.TextOps.hash60(
            concat(lit("split"), col("doc_id"))), lit(100)).as("b"))
        .filter(col("doc_id") === doc0)
        .collect().head.getLong(1)
    }
    assert(splitOfDoc0 == bucket, s"engine bucket $splitOfDoc0 != replay $bucket")
    assert(got != null && expected.nonEmpty) // replay reached both paths
  }

  test("table profile: one row per column, stats replay for two columns") {
    val rows = Audit.tableProfile(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice"))
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    val ndKey = o.select(countDistinct(col("o_orderkey"))).collect().head.getLong(0)
    val byName = rows.map(r => (r.getAs[String]("col_name"), r)).toMap
    assert(rows.forall(_.getAs[Long]("n") == n))
    assert(byName("o_orderkey").getAs[Long]("n_distinct") == ndKey)
    assert(byName("o_orderkey").getAs[Long]("n_nulls") == 0L)
    val mn = o.agg(min(col("o_totalprice"))).collect().head.getDouble(0)
    assert(byName("o_totalprice").getAs[String]("min_s")
      == BigDecimal(mn).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString)
  }
}
