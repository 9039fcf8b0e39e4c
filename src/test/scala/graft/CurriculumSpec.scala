package graft

import graft.ops.Curriculum

/** q231 — curriculum phase assignment over exact difficulty quartiles. */
class CurriculumSpec extends SparkSpec {

  private def tok(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq

  private def rnd(x: Double, s: Int) = BigDecimal(x)
    .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver replay of the per-doc difficulty with the op's exact
    * rounding ladder (idf round 9 → exact decimal sum → round 6). */
  private lazy val replayDiff: Map[Long, (Long, Double)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tok(r.getString(1)))
    val nDocs = docs.length.toDouble
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, g) => t -> g.length }
    // token-less docs are excluded from phasing (the op's inner join
    // on exploded tokens drops them) — mirror that here, both for the
    // contract and because /0 would throw in the replay (r12 ADVICE)
    docs.filter(_._2.nonEmpty).map { case (id, ts) =>
      val idfs = ts.map(t => BigDecimal(rnd(math.log(nDocs / df(t)), 9)))
      id -> (ts.length.toLong, rnd((idfs.sum / ts.length).toDouble, 6))
    }.toMap
  }

  private lazy val out = Curriculum.curriculumPhases(spark, sfDir).collect()

  test("vocab join is never statically broadcast (q69 rule)") {
    // the final query checkpoints the difficulty relation, so the
    // tok join only appears in the PRE-checkpoint subtree's plan
    val plan = Curriculum.difficulty(spark, sfDir)
      .queryExecution.sparkPlan.toString
    val tokJoins = plan.linesIterator.filter(l =>
      l.contains("Join") && l.contains("[tok#")).toSeq
    assert(tokJoins.nonEmpty, "expected a tok-keyed join in the plan")
    tokJoins.foreach(l => assert(!l.contains("BroadcastHashJoin"),
      s"vocab-sized df relation statically broadcast: $l"))
  }

  test("phases partition the corpus and are difficulty-ordered") {
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getLong(1)).sum == replayDiff.size)
    out.sliding(2).foreach { w =>
      assert(w(0).getDouble(3) <= w(1).getDouble(2),
        "max_difficulty of a phase must not exceed the next phase's min")
    }
  }

  test("phase sizes follow percentile_disc rank semantics") {
    val diffs = replayDiff.values.map(_._2).toSeq.sorted
    val n = diffs.size
    // thresholds = value at rank ceil(q*n); ties all land in the
    // lower phase, so cumulative counts are >= the rank
    val cum = out.map(_.getLong(1)).scanLeft(0L)(_ + _).drop(1)
    Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (q, i) =>
      val r = math.ceil(q * n).toLong
      assert(cum(i) >= r, s"phase cut $q holds at least rank $r")
      val t = diffs((r - 1).toInt)
      assert(cum(i) == diffs.count(_ <= t), s"phase cut $q is exactly <= threshold")
    }
  }

  test("per-phase profile replays from scratch") {
    val diffs = replayDiff.values.map(_._2).toSeq.sorted
    val n = diffs.size
    val ts = Seq(0.25, 0.5, 0.75).map(q => diffs(math.ceil(q * n).toInt - 1))
    def phaseOf(d: Double): Long =
      if (d <= ts(0)) 0L else if (d <= ts(1)) 1L else if (d <= ts(2)) 2L else 3L
    val expected = replayDiff.values.toSeq.groupBy { case (_, d) => phaseOf(d) }
    out.foreach { r =>
      val grp = expected(r.getLong(0))
      assert(r.getLong(1) == grp.size, s"n_docs@${r.getLong(0)}")
      assert(r.getDouble(2) == grp.map(_._2).min, s"min@${r.getLong(0)}")
      assert(r.getDouble(3) == grp.map(_._2).max, s"max@${r.getLong(0)}")
      val avgD = rnd(grp.map(x => BigDecimal(x._2)).sum.toDouble / grp.size, 6)
      assert(r.getDouble(4) == avgD, s"avg_difficulty@${r.getLong(0)}")
      val avgT = rnd(grp.map(_._1).sum.toDouble / grp.size, 2)
      assert(r.getDouble(5) == avgT, s"avg_tokens@${r.getLong(0)}")
    }
  }
}
