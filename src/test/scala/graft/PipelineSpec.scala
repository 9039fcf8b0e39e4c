package graft

import graft.ops.Pipeline
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token with stride-48 windows") {
    val chunks = Pipeline.chunkDocs(spark, sfDir).collect()
    val docTokens = Tables.documents(spark, sfDir).filter($"doc_id" < 20)
      .select($"doc_id", size(graft.functions.TextOps.tokens($"text"))
        .as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.groupBy(_.getLong(0)).foreach { case (docId, cs) =>
      val n = docTokens(docId)
      val starts = (1 to n by 48).toSeq
      assert(cs.length === starts.size, s"doc $docId chunk count")
      // chunk c covers tokens [start, start+63] clipped to the doc —
      // together the windows cover every token (stride < window)
      val sizes = cs.sortBy(_.getLong(1)).map(_.getLong(2))
      sizes.zip(starts).foreach { case (s, st) =>
        assert(s === math.min(64, n - st + 1).toLong, s"doc $docId @ $st")
      }
      assert(starts.last + sizes.last - 1 === n, s"doc $docId tail coverage")
    }
  }

  test("repetition ratio is in [0,1) and detects repeated text") {
    val base = Pipeline.repetitionScore(spark, sfDir).collect()
    base.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
    // a fully repeated doc scores high
    val rep = Seq((0L, ("spark fast merge " * 30).trim))
      .toDF("doc_id", "text")
      .withColumn("toks", graft.functions.TextOps.tokens($"text"))
      .select($"doc_id",
        graft.functions.TextOps.shinglesFromTokens($"toks").as("grams"))
      .select((lit(1.0) - size(array_distinct($"grams")).cast("double")
        / size($"grams")).as("ratio"))
      .as[Double].head()
    assert(rep > 0.9)
  }

  test("PII scrub finds exactly the planted emails/phones and redacts them") {
    val rows = Pipeline.piiScrub(spark, sfDir).collect()
    rows.foreach { r =>
      val planted = r.getLong(0) % 5 == 0
      assert(r.getAs[Long]("n_emails") === (if (planted) 1L else 0L))
      assert(r.getAs[Long]("n_phones") === (if (planted) 1L else 0L))
    }
  }

  test("domain quota keeps at most 3 per domain, highest quality first") {
    val out = Pipeline.domainQuota(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_kept") <= 3))
    // kept min quality must be >= the domain's 4th-best quality
    val wp = Corpus.webPages(spark, sfDir)
      .withColumn("q", graft.functions.TextOps.qualityScore($"content"))
    val fourth = wp.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"domain").orderBy($"q".desc, $"id")))
      .filter($"rn" === 4).select($"domain", $"q".as("q4"))
    val bad = Pipeline.domainQuota(spark, sfDir)
      .join(fourth, "domain").filter($"min_quality" < $"q4").count()
    assert(bad === 0)
  }

  test("source mix: temperature up-weights small sources, draw lands near target") {
    // target below the corpus size so rates stay < 1 (sf0.001 has
    // exactly 500 docs — the default target would keep everything)
    val rows = Pipeline.sourceMix(spark, sfDir, target = 100).collect()
    val shares = rows.map(r => r.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 0.001)
    // temperature 0.7 < 1: every source's share exceeds proportional
    // share iff it's smaller than average — check the extremes
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val smallest = rows.minBy(_.getAs[Long]("n_docs"))
    val largest = rows.maxBy(_.getAs[Long]("n_docs"))
    if (smallest.getAs[Long]("n_docs") != largest.getAs[Long]("n_docs")) {
      assert(smallest.getAs[Double]("share") >
        smallest.getAs[Long]("n_docs") / total)
      assert(largest.getAs[Double]("share") <
        largest.getAs[Long]("n_docs") / total)
    }
    val drawn = rows.map(_.getAs[Long]("n_sampled")).sum
    assert(drawn > 0 && drawn < total)
  }

  test("stratified quota: exactly k per stratum, membership reproducible") {
    val a = Pipeline.stratifiedQuota(spark, sfDir, k = 7).collect()
    assert(a.nonEmpty)
    a.foreach(r => assert(r.getAs[Long]("n_sampled") === 7L))
    // deterministic: a second run draws the identical sample
    val b = Pipeline.stratifiedQuota(spark, sfDir, k = 7).collect()
    assert(a.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      b.map(r => (r.getString(0), r.getLong(2))).toSeq)
  }

  test("contamination finds the planted verbatim inclusions") {
    val rows = Pipeline.contamination(spark, sfDir).collect()
    assert(rows.length === 5) // every benchmark doc has a planted copy
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated_docs") >= 1)
      assert(r.getAs[Long]("n_shared_grams") >= 1)
    }
  }

  test("loop artifacts match a sequential-scan recompute of longest runs") {
    // independent derivation: pull token arrays through Spark, then
    // compute longest period-p runs with a PLAIN SEQUENTIAL SCAN in
    // Scala (the textbook algorithm) and aggregate per source —
    // cross-checks the operator's string-run trick end to end,
    // including the planted loop docs.
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        graft.functions.TextOps.tokens($"text").as("toks"))
      .as[(Long, String, Seq[String])].collect()
    val planted = toks.filter(_._1 % 40 == 0).map { case (id, src, ts) =>
      (id + 400000, src,
        ts ++ Seq.fill(8)(Seq("loop", "the", "gain")).flatten)
    }
    def maxRun(ts: Seq[String], p: Int): Int = {
      if (ts.length <= p) 0
      else {
        var best = 0; var cur = 0
        var i = 0
        while (i < ts.length - p) {
          if (ts(i) == ts(i + p)) { cur += 1; if (cur > best) best = cur }
          else cur = 0
          i += 1
        }
        best
      }
    }
    val expected = (toks ++ planted).groupBy(_._2).map { case (src, ds) =>
      src -> (ds.length.toLong,
        ds.count(d => maxRun(d._3, 1) >= 2).toLong,
        ds.count(d => maxRun(d._3, 2) >= 4).toLong,
        ds.count(d => maxRun(d._3, 3) >= 6).toLong,
        ds.map(d => maxRun(d._3, 3)).max.toLong)
    }
    val got = Pipeline.loopArtifacts(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val e = expected(src)
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("n_loop1"),
        r.getAs[Long]("n_loop2"), r.getAs[Long]("n_loop3"),
        r.getAs[Long]("max_run3")) === e, s"source $src")
    }
    // every planted doc has a period-3 run of 21 ≥ the threshold 6,
    // so the detector must fire at least once per plant corpus-wide
    assert(got.map(_.getAs[Long]("n_loop3")).sum >= planted.length,
      "planted loops not all detected")
    assert(planted.nonEmpty)
  }
}
