package graft

import graft.ops.{Curation, Ranking, Robots, Urls}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-5 curation suite (q81-q87). The
  * DuckDB oracle proves engine parity; these pin the SEMANTICS —
  * span removal matches a brute-force recomputation, the classifier
  * responds to its features in the right direction, packing conserves
  * tokens, canonical groups collapse exactly, robots longest-match
  * resolves the planted Allow/Disallow overlap.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def tokenize(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  test("spanDedup removal matches a brute-force recomputation") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toks = docs.map { case (id, t) => id -> tokenize(t) }.toMap
    val grams = toks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(Curation.SpanN).filter(_.size == Curation.SpanN)
        .map(g => (g.mkString(" "), id))
    }
    val freq = grams.distinct.groupBy(_._1).filter(_._2.size >= Curation.SpanDocThreshold).keySet
    val expected = toks.map { case (id, ts) =>
      val starts = ts.sliding(Curation.SpanN).zipWithIndex
        .filter { case (g, _) => g.size == Curation.SpanN && freq(g.mkString(" ")) }
        .map(_._2).toSeq
      val covered = starts.flatMap(s => s until (s + Curation.SpanN)).toSet
      id -> ts.indices.count(covered.contains)
    }
    val got = Curation.spanDedup(spark, sfDir)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, n) => assert(got(id) === n.toLong,
      s"doc $id: expected $n removed, got ${got(id)}") }
    assert(expected.values.sum > 0, "threshold too high: nothing removed")
  }

  test("spanDedup keeps untouched docs verbatim (hash check)") {
    val out = Curation.spanDedup(spark, sfDir)
    val orig = Tables.documents(spark, sfDir).select(col("doc_id"),
      graft.functions.TextOps.hash60(
        concat_ws(" ", graft.functions.TextOps.tokens(col("text"))))
        .as("orig_hash"))
    val mismatched = out.filter(col("n_removed") === 0)
      .join(orig, Seq("doc_id"))
      .filter(col("kept_hash") =!= col("orig_hash")).count()
    assert(mismatched === 0)
  }

  test("quality classifier rewards stopwords, punishes digits and repetition") {
    val probe = Seq(
      (1L, "s", "the cat sat of the mat and all was well in the house"),
      (2L, "s", "cat sat mat all was well house zebra quick brown fox jumps"),
      (3L, "s", "111 222 333 444 555 666 777 888 999 000 123 456 789"),
      (4L, "s", "spam spam spam spam spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "source", "text")
    val s = Curation.scoreDocs(probe).select("doc_id", "score")
      .as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L), "stopword-rich should beat stopword-free")
    assert(s(2L) > s(3L), "prose should beat digit runs")
    assert(s(2L) > s(4L), "diverse should beat pure repetition")
    s.values.foreach(v => assert(v > 0.0 && v < 1.0))
  }

  test("seqPack conserves tokens and bounds fill ratio") {
    val out = Curation.seqPack(spark, sfDir).collect()
    val totalChunkTokens = Tables.documents(spark, sfDir)
      .select(size(graft.functions.TextOps.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
      .select(explode(sequence(lit(1), col("n"), lit(48))).as("start"), col("n"))
      .select(least(lit(64), col("n") - col("start") + 1).as("t"))
      .agg(sum("t")).as[Long].head()
    assert(out.map(_.getAs[Long]("total_tokens")).sum === totalChunkTokens)
    out.foreach { r =>
      val fill = r.getAs[Double]("fill_ratio")
      // a sequence holds ≥ B-63 committed tokens (chunks ≤ 64 straddle)
      assert(fill > 0.0 && fill <= (Curation.PackBudget + 63.0) / Curation.PackBudget)
      assert(r.getAs[Long]("n_seqs") >= 1)
    }
  }

  test("canonicalize collapses tracking/port/fragment/slash variants and is idempotent") {
    val out = Urls.urlCanonical(spark, sfDir).collect()
    val byN = out.groupBy(_.getAs[Long]("n_variants")).view.mapValues(_.length).toMap
    // per page: {fragment, upper-host:443, trailing-slash} → base (3);
    // the kept `?id=` param variant stays its own canonical (1)
    assert(byN === Map(3L -> 50, 1L -> 50))
    val urls = Seq("HTTPS://D4.TEST:443/p/4#x?utm_source=a").toDF("u")
    val once = urls.select(Urls.canonicalize(col("u")).as("c"))
    val twice = once.select(Urls.canonicalize(col("c")).as("c"))
    assert(once.as[String].head() === twice.as[String].head())
  }

  /** Independent RFC 9309 matcher: escape regex metachars, `*`→`.*`,
    * trailing `$` anchors; longest raw pattern wins, Allow on ties. */
  private def rfc9309Allowed(rules: Seq[(String, String)], path: String): Boolean = {
    def toRx(p: String): String = {
      val anchored = p.endsWith("$")
      val body = if (anchored) p.dropRight(1) else p
      val esc = body.flatMap {
        case c if ".\\[]{}()+?^$|".contains(c) => "\\" + c
        case '*' => ".*"
        case c => c.toString
      }
      "^" + esc + (if (anchored) "$" else "")
    }
    val hits = rules.filter { case (_, p) =>
      toRx(p).r.findFirstIn(path).isDefined }
    if (hits.isEmpty) true
    else {
      val best = hits.maxBy { case (rule, p) => (p.length, rule == "allow") }
      best._1 == "allow"
    }
  }

  test("robots RFC 9309 matching: wildcards, anchors, longest-match, Allow ties") {
    val rules = Robots.parseRules(Robots.robotsTxt(spark))
    // the googlebot group must not leak into the * group
    val star = rules.filter(col("agent") === "*")
    assert(star.filter(col("prefix") === "/").count() === 0)
    // the corpus must actually contain wildcard/anchor rules
    assert(star.filter(col("prefix").contains("*")).count() > 0)
    assert(star.filter(col("prefix").endsWith("$")).count() > 0)
    val starRules = star.select("domain", "rule", "prefix")
      .as[(String, String, String)].collect()
      .groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => (x._2, x._3)).toSeq }
    val out = Robots.robotsEnforce(spark, sfDir)
      .collect().map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_allowed"))).toMap
    // brute-force the expected verdicts with the independent matcher
    val ids = Tables.part(spark, sfDir).select("p_partkey").as[Long]
      .collect().filter(_ < 400)
    val expected = ids.groupBy(id => s"d${id % 20}.test").map { case (dom, xs) =>
      dom -> xs.count(id => rfc9309Allowed(starRules(dom), s"/p/$id")).toLong
    }
    expected.foreach { case (dom, nAllowed) =>
      assert(out(dom)._2 === nAllowed, s"$dom allowed mismatch") }
    // the wildcard disallow must block something, and its longer
    // Allow must re-allow something, in at least one domain
    val anyBlocked = ids.exists { id =>
      !rfc9309Allowed(starRules(s"d${id % 20}.test"), s"/p/$id")
    }
    assert(anyBlocked, "no URL blocked — rules never fire")
    val reAllowed = ids.exists { id =>
      val dom = s"d${id % 20}.test"
      val rs = starRules(dom)
      val wildcardOnly = rs.filter { case (r, p) =>
        r == "disallow" && p.contains("*") }
      val blockedByWildcard = !rfc9309Allowed(
        wildcardOnly.map { case (_, p) => ("disallow", p) }, s"/p/$id")
      blockedByWildcard && rfc9309Allowed(rs, s"/p/$id")
    }
    assert(reAllowed, "wildcard Allow override never fires")
  }

  test("patternToRegex handles wildcard, anchor, and metachar escape") {
    val cases = Seq(
      ("/p/1*3$", "/p/123", true),   // star + anchor hit
      ("/p/1*3$", "/p/1234", false), // anchor rejects suffix
      ("/p/1*3$", "/p/13", true),    // star matches empty
      ("/*.pdf$", "/a/b.pdf", true), // classic extension block
      ("/*.pdf$", "/a/b.pdfx", false),
      ("/a.c", "/abc", false),       // dot is LITERAL, not regex-any
      ("/a.c", "/a.c", true),
      ("/p/", "/p/7", true),         // plain prefix still prefix
      ("/p/$", "/p/", true),         // anchor on exact path
      ("/p/$", "/p/7", false))
    val df = cases.toDF("pattern", "path", "want")
      .withColumn("got", regexp_like(col("path"),
        Robots.patternToRegex(col("pattern"))))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("bigram LM: rarer transitions score lower than common ones") {
    val out = Ranking.bigramLogprob(spark, sfDir).collect()
    assert(out.length === 10)
    val scores = out.map(_.getAs[Double]("avg_logprob"))
    assert(scores.sameElements(scores.sorted), "ascending by surprise")
    scores.foreach(s => assert(s < 0.0))
  }

  test("tfidf retrieves docs containing query terms, cosine in [0,1]") {
    val out = Ranking.tfidf(spark, sfDir).collect()
    assert(out.length === 10)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0 + 1e-9)
      val toks = tokenize(docs(r.getAs[Long]("doc_id"))).toSet
      assert(Ranking.QueryTerms.exists(toks.contains))
    }
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse), "descending")
  }

  test("perplexity buckets: per-lang conservation, tercile balance, head>tail") {
    val rows = Curation.perplexityBuckets(spark, sfDir).collect()
    val tokenized = Tables.documents(spark, sfDir)
      .select(col("lang"),
        size(graft.functions.TextOps.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_toks"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet === tokenized.keySet)
    byLang.foreach { case (lang, rs) =>
      val (nDocs, nToks) = tokenized(lang)
      // every tokenized doc lands in exactly one bucket; tokens conserve
      assert(rs.map(_.getAs[Long]("n_docs")).sum === nDocs, s"$lang docs")
      assert(rs.map(_.getAs[Long]("n_tokens")).sum === nToks, s"$lang tokens")
      val byBucket = rs.map(r =>
        r.getAs[String]("bucket") -> r).toMap
      assert(byBucket.keySet === Set("head", "middle", "tail"), s"$lang buckets")
      // fluency ordering: head is the high-logprob (low-perplexity) third
      assert(byBucket("head").getAs[Double]("avg_logprob") >
        byBucket("middle").getAs[Double]("avg_logprob"), s"$lang head>mid")
      assert(byBucket("middle").getAs[Double]("avg_logprob") >
        byBucket("tail").getAs[Double]("avg_logprob"), s"$lang mid>tail")
      // terciles: interpolated cutpoints keep buckets within one of n/3
      // up to score ties; the corpus has no mass ties, so stay tight
      val counts = byBucket.view.mapValues(_.getAs[Long]("n_docs")).toMap
      counts.foreach { case (b, n) =>
        assert(math.abs(n - nDocs / 3.0) <= nDocs / 6.0 + 2,
          s"$lang $b grossly unbalanced: $n of $nDocs")
      }
    }
  }

  test("filter calibration: monotone curve, t=0 keeps everything") {
    val rows = Curation.filterCalibration(spark, sfDir).collect()
      .sortBy(_.getAs[Double]("t"))
    assert(rows.length === Curation.CalibThresholds.size)
    val nTotal = rows.head.getAs[Long]("n_total")
    rows.foreach(r => assert(r.getAs[Long]("n_total") === nTotal))
    // sigmoid scores are strictly positive → t=0 keeps every doc
    assert(rows.head.getAs[Long]("n_kept") === nTotal)
    assert(rows.head.getAs[Double]("frac_kept") === 1.0)
    // independent recompute from the per-doc scores
    val scores = Curation.scoreDocs(Tables.documents(spark, sfDir))
      .select(col("score")).as[Double].collect()
    rows.foreach { r =>
      val t = r.getAs[Double]("t")
      val kept = scores.filter(_ >= t)
      assert(r.getAs[Long]("n_kept") === kept.length.toLong, s"t=$t count")
      if (kept.nonEmpty) {
        val avg = (kept.map(BigDecimal(_)).sum / kept.length).toDouble
        assert(math.abs(r.getAs[Double]("avg_kept") - avg) < 1e-5, s"t=$t avg")
      }
    }
    // raising the bar keeps fewer docs of higher average quality
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_kept") >= hi.getAs[Long]("n_kept"))
      if (hi.getAs[Long]("n_kept") > 0)
        assert(hi.getAs[Double]("avg_kept") >=
          lo.getAs[Double]("avg_kept") - 1e-9)
    }
  }
}
