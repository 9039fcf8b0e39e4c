package graft

import graft.ops.{Behavior, Dsir, Funnel, KMeans, Quant, SemDedup, Snapshot, Stats, Timeseries, Winnow}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Semantic guarantees of the round-5 second-wave additions: calendar
  * gap-fill LOCF invariants (q98), DSIR importance weights vs a
  * from-scratch recompute (q99), SemDeDup keep/remove consistency vs
  * brute force within clusters (q100), and two-pass exact quantiles
  * vs sort-and-index (q101).
  */
class CurationScaleSpec extends SparkSpec {

  test("gap-fill: contiguous spine, LOCF semantics, first row observed") {
    val rows = Timeseries.gapFill(spark, sfDir).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.nonEmpty)
    var sawGap = false
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_.getAs[String]("day")).sorted
      assert(days.distinct.length == days.length, s"user $u duplicate days")
      // contiguous calendar: day count == span between first and last
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head),
        java.time.LocalDate.parse(days.last)) + 1
      assert(days.length.toLong == span, s"user $u spine has holes")
      val ordered = rs.sortBy(_.getAs[String]("day"))
      assert(ordered.head.getAs[Boolean]("observed"), s"user $u starts unobserved")
      var lastObserved = Double.NaN
      ordered.foreach { r =>
        if (r.getAs[Boolean]("observed"))
          lastObserved = r.getAs[Double]("v_filled")
        else {
          sawGap = true
          assert(r.getAs[Double]("v_filled") == lastObserved,
            s"user $u day ${r.getAs[String]("day")}: carry-forward broke")
        }
      }
    }
    assert(sawGap, "test data produced no gaps — LOCF path unexercised")
  }

  test("dsir: weights match a from-scratch recompute; top-10 ordering holds") {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextOps.tokens(col("text"))).as("tok"))
      .as[(Long, String, String)].collect()
    val cRaw = toks.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val cTgt = toks.filter(_._2 == Dsir.TargetLang)
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val nRaw = cRaw.values.sum.toDouble
    val nTgt = cTgt.values.sum.toDouble
    val v = cRaw.size.toDouble
    def rnd9(x: Double) = math.rint(x * 1e9) / 1e9
    val expected = toks.groupBy(_._1).map { case (id, ts) =>
      val lws = ts.map { case (_, _, t) =>
        BigDecimal(rnd9(math.log((cTgt.getOrElse(t, 0L) + 1.0) / (nTgt + v)))
          - rnd9(math.log((cRaw(t) + 1.0) / (nRaw + v))))
      }
      id -> (math.rint((lws.sum / ts.length).toDouble * 1e6) / 1e6)
    }
    val top = expected.toSeq.sortBy { case (id, w) => (-w, id) }.take(10)
    val got = Dsir.dsirWeights(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_log_ratio"))
    assert(got.toSeq == top, s"got ${got.toSeq}\nexp $top")
  }

  test("semdedup: removed ⟺ has a smaller-id τ-neighbor in the same cluster") {
    import spark.implicits._
    val assigned = KMeans.docAssignments(spark, sfDir)
      .select(col("vec_id"), col("v"), col("cid"))
      .as[(Long, Seq[Double], Int)].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var k = 0
      while (k < a.length) {
        d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k); k += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else math.rint(d / den * 1e9) / 1e9
    }
    val removedBrute = (for {
      (i, vi, c) <- assigned
      (j, vj, c2) <- assigned
      if c == c2 && i < j && cos(vi, vj) >= SemDedup.Tau
    } yield j).toSet
    val rows = SemDedup.semDedup(spark, sfDir).collect()
    val byCluster = assigned.groupBy(_._3)
    rows.foreach { r =>
      val cid = r.getAs[Int]("cid")
      val members = byCluster(cid).map(_._1).toSet
      assert(r.getAs[Long]("n_total") == members.size)
      assert(r.getAs[Long]("n_removed") == (members & removedBrute).size)
      assert(r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_total") - r.getAs[Long]("n_removed"))
    }
    assert(rows.map(_.getAs[Long]("n_total")).sum == assigned.length)
    assert(removedBrute.nonEmpty, "no planted near-dups — τ path unexercised")
  }

  test("winnowing: the k+w-1 shared-run guarantee holds on planted near-dups") {
    import spark.implicits._
    // every planted copy (doc_id + 100000) shares all of its
    // original's text — the pair MUST surface with a large shared
    // fingerprint count, and shared counts can never exceed either
    // doc's own fingerprint count
    val fps = Winnow.fingerprints(spark, sfDir)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pairs = Winnow.winnowPairs(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, s) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("shared_fps"))
      assert(s <= math.min(fps(a).size, fps(b).size))
    }
    // the top pair is a planted (original, copy) pair
    val top = pairs.head
    assert(top.getAs[Long]("b_id") == top.getAs[Long]("a_id") + 100000,
      s"top pair not a planted dup: $top")
    // guarantee check: original ⊂ copy fingerprints up to the tail
    val (o, c) = (top.getAs[Long]("a_id"), top.getAs[Long]("b_id"))
    val overlap = (fps(o) & fps(c)).size.toDouble / fps(o).size
    assert(overlap > 0.9, s"planted pair overlap only $overlap")
  }

  test("int8 quantization: error bounded by scale/2, cosine near 1") {
    val rows = Quant.int8Quant(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // max|x| = 127·scale and |err| ≤ scale/2 ⇒ err ≤ max|x|/254;
      // embeddings are unit-norm so max|x| ≤ 1 ⇒ err ≤ ~0.004
      assert(r.getAs[Double]("worst_abs_err") <= 1.0 / 254.0 + 1e-9)
      assert(r.getAs[Double]("avg_cosine") > 0.999,
        s"label ${r.getAs[Int]("label")}: cosine degraded")
    }
  }

  test("length buckets: token conservation and ceiling consistency") {
    import spark.implicits._
    val rows = Quant.lengthBuckets(spark, sfDir).collect()
    val totalReal = rows.map(_.getAs[Long]("real_tokens")).sum
    val expected = Tables.documents(spark, sfDir)
      .select(graft.functions.TextOps.tokenCount(col("text")).cast("long"))
      .as[Long].collect().sum
    assert(totalReal == expected, "real tokens not conserved across buckets")
    rows.foreach { r =>
      val waste = r.getAs[Double]("waste_frac")
      assert(waste >= 0.0 && waste < 1.0)
      // padded volume = real + pad = bucket · n_docs exactly
      assert(r.getAs[Long]("real_tokens") + r.getAs[Long]("pad_tokens") ==
        r.getAs[Int]("bucket").toLong * r.getAs[Long]("n_docs"))
    }
  }

  test("filter funnel: monotone attrition, dedup stage kills every planted copy") {
    val rows = Funnel.filterFunnel(spark, sfDir).collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length == 4)
    // chained: stage k's n_in is stage k-1's n_out; counts never grow
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"))
    }
    // every planted upper-case copy that reaches stage 4 must die
    // there (its lowercase original has the smaller id and the same
    // fingerprint), so stage-4 attrition > 0
    val dedup = rows.last
    assert(dedup.getAs[String]("filter") == "exact_dedup")
    assert(dedup.getAs[Long]("n_out") < dedup.getAs[Long]("n_in"),
      "dedup stage dropped nothing — planted copies missing")
  }

  test("snapshot drift: counts match the carve, shares sum to 1, KL >= 0") {
    import spark.implicits._
    val rows = Snapshot.snapshotDrift(spark, sfDir).collect()
    val bySrc = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id")).as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2) }
    assert(rows.length === bySrc.size)
    rows.foreach { r =>
      val ids = bySrc(r.getAs[String]("source"))
      // old generation = ids not ≡0 (mod 5), plus the ≡0 (mod 13)
      // phantom rows; new generation = the table itself
      assert(r.getAs[Long]("n_old") ===
        ids.count(_ % 5 != 0) + ids.count(_ % 13 == 0))
      assert(r.getAs[Long]("n_new") === ids.length.toLong)
    }
    assert(math.abs(rows.map(_.getAs[Double]("p_old")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("p_new")).sum - 1.0) < 1e-4)
    // Gibbs: KL(new ‖ old) ≥ 0 over the full support (rounding slack)
    assert(rows.map(_.getAs[Double]("kl_term")).sum >= -1e-6)
    // drift is real: the carve shifts at least one source's share
    assert(rows.map(_.getAs[Double]("abs_shift")).max > 0)
  }

  test("snapshot diff: statuses match the deterministic carve") {
    import spark.implicits._
    val byStatus = Snapshot.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long].collect()
    assert(byStatus("added") == ids.count(_ % 5 == 0))
    assert(byStatus("removed") == ids.count(_ % 13 == 0))
    assert(byStatus("changed") == ids.count(i => i % 5 != 0 && i % 7 == 0))
    assert(byStatus("unchanged") == ids.count(i => i % 5 != 0 && i % 7 != 0))
    assert(byStatus.values.sum == ids.length + ids.count(_ % 13 == 0))
  }

  test("event funnel: ordered semantics match a per-user brute-force replay") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val byUser = events.groupBy(_._1)
    def firstAfter(rows: Array[(Long, String, Long)], tpe: String,
        after: Long): Option[Long] = {
      val c = rows.filter(r => r._2 == tpe && r._3 > after)
      if (c.isEmpty) None else Some(c.map(_._3).min)
    }
    var nView = 0L; var nClick = 0L; var nPurchase = 0L
    byUser.values.foreach { rows =>
      firstAfter(rows, "view", Long.MinValue).foreach { t1 =>
        nView += 1
        firstAfter(rows, "click", t1).foreach { t2 =>
          nClick += 1
          firstAfter(rows, "purchase", t2).foreach(_ => nPurchase += 1)
        }
      }
    }
    val r = Behavior.eventFunnel(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_users") == byUser.size)
    assert(r.getAs[Long]("n_view") == nView)
    assert(r.getAs[Long]("n_click_after_view") == nClick)
    assert(r.getAs[Long]("n_purchase_after_click") == nPurchase)
    assert(nPurchase > 0, "funnel bottom empty — ordering path unexercised")
  }

  test("cohort retention: k=0 is always total, retention never exceeds 1") {
    val rows = Behavior.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[String]("cohort_day"))
    byCohort.foreach { case (c, rs) =>
      val k0 = rs.find(_.getAs[Long]("k") == 0L)
        .getOrElse(fail(s"cohort $c missing k=0"))
      // on their first-seen day, every cohort member is active
      assert(k0.getAs[Long]("n_active") == k0.getAs[Long]("cohort_n"))
      rs.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_n"))
        assert(r.getAs[Double]("retention") <= 1.0)
      }
    }
  }

  test("co-purchase: counts match a basket-replay; lift consistent with marginals") {
    import spark.implicits._
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val baskets = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]()
    baskets.values.foreach { parts =>
      val sorted = parts.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        pairCounts((sorted(i), sorted(j))) =
          pairCounts.getOrElse((sorted(i), sorted(j)), 0L) + 1L
    }
    val marg = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nB = baskets.size.toDouble
    val rows = Behavior.copurchasePairs(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val k = (r.getAs[Long]("pa"), r.getAs[Long]("pb"))
      assert(r.getAs[Long]("n_ab") == pairCounts(k), s"count mismatch at $k")
      val lift = math.rint(pairCounts(k) * nB / (marg(k._1) * marg(k._2))
        * 1e6) / 1e6
      assert(r.getAs[Double]("lift") == lift, s"lift mismatch at $k")
    }
    // the returned pairs are exactly the count-desc/(pa,pb)-asc top-10
    val expectedTop = pairCounts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(10).map(_._1)
    assert(rows.map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"))).toSeq
      == expectedTop)
  }

  test("hits: two-iteration scores match a driver-side replay") {
    import spark.implicits._
    val edges = Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("s"),
        pmod(col("l_partkey"), lit(2000)).as("t"))
      .distinct().as[(Long, Long)].collect()
    def rnd(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[Long, Double]
    for (_ <- 1 to graft.ops.Graph.HitsIters) {
      val rawA = edges.groupBy(_._2).map { case (d, es) =>
        d -> rnd(es.map(e => BigDecimal(hub(e._1))).sum.toDouble, 12)
      }
      val ta = rawA.values.map(BigDecimal(_)).sum.toDouble
      auth = rawA.map { case (k, v) => k -> rnd(v / ta, 12) }
      val rawH = edges.filter(e => auth.contains(e._2)).groupBy(_._1)
        .map { case (s, es) =>
          s -> rnd(es.map(e => BigDecimal(auth(e._2))).sum.toDouble, 12)
        }
      val th = rawH.values.map(BigDecimal(_)).sum.toDouble
      hub = rawH.map { case (k, v) => k -> rnd(v / th, 12) }
    }
    val expected = auth.toSeq.sortBy { case (n, a) => (-a, n) }.take(10)
    val got = graft.ops.Graph.hits(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Double]("auth"),
        r.getAs[Double]("hub")))
    assert(got.map(g => (g._1, g._2)).toSeq == expected)
    got.foreach { case (n, _, h) =>
      assert(h == hub.getOrElse(n, 0.0), s"hub mismatch at node $n")
    }
  }

  test("exact quantiles: two-pass bin-and-refine equals sort-and-index") {
    import spark.implicits._
    val vals = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
    val expected = (for {
      (g, vs) <- vals.groupBy(_._1)
      q <- Stats.QuantileQs
    } yield {
      val sorted = vs.map(_._2).sorted
      val r = math.ceil(q * sorted.length).toLong
      (g, q) -> sorted((r - 1).toInt)
    }).toMap
    val got = Stats.quantileDisc(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getAs[String]("g"), r.getAs[Double]("q"))
      assert(r.getAs[Double]("value") == expected(k),
        s"$k: got ${r.getAs[Double]("value")}, exp ${expected(k)}")
    }
  }
}
