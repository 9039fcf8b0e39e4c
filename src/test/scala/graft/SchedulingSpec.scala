package graft

import graft.ops.{Behavior, Frontier, Incremental, Timeseries}
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** Semantic guarantees of the lakehouse/scheduling wave (q123-q126):
  * SCD2 interval tiling, frontier politeness caps vs a replay,
  * incremental-dedup count identities, and last-touch attribution vs
  * a per-purchase driver replay.
  */
class SchedulingSpec extends SparkSpec {

  test("scd2: intervals tile each user's change history") {
    val rows = Timeseries.scd2Build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("valid_from"))
      // exactly one open interval, and it is the last one
      assert(ordered.dropRight(1).forall(!_.getAs[Boolean]("is_current")))
      assert(ordered.last.getAs[Boolean]("is_current"))
      assert(ordered.last.isNullAt(ordered.last.fieldIndex("valid_to")))
      // closed intervals chain: valid_to == next valid_from, no gaps
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from"),
            s"user $u: interval chain broken")
          assert(a.getAs[String]("event_type")
            != b.getAs[String]("event_type"),
            s"user $u: consecutive intervals share a type (not collapsed)")
        case _ =>
      }
    }
  }

  test("frontier batch: politeness cap holds and the cut replays") {
    val edges = Tables.lineitem(spark, sfDir)
      .select(pmod(col("l_orderkey"), lit(2000)).as("src"),
        pmod(col("l_partkey"), lit(2000)).as("dst"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val indeg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    // replay: per-host top-PerHostCap by (indeg desc, node), then global cut
    val expected = indeg.toSeq
      .map { case (n, d) => (n % 50, n, d) }
      .groupBy(_._1).values.flatMap { host =>
        host.sortBy { case (_, n, d) => (-d, n) }.take(Frontier.PerHostCap)
      }.toSeq
      .sortBy { case (_, n, d) => (-d, n) }
      .take(Frontier.BatchSize)
      .map { case (h, n, d) => (h, n, d) }

    val rows = Frontier.nextBatch(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("host"), r.getAs[Long]("node"),
        r.getAs[Long]("indeg")))
    assert(rows.length == expected.length)
    assert(rows.toSeq == expected,
      "frontier selection diverged from the politeness-capped replay")
    rows.groupBy(_._1).foreach { case (h, rs) =>
      assert(rs.length <= Frontier.PerHostCap, s"host $h over cap")
    }
  }

  test("incremental dedup: count identities and a fingerprint replay") {
    val fps = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val batch = fps.filter(_._1 % 10 == 0)
    val corpusSet = fps.filter(_._1 % 10 != 0).map(_._2).toSet
    val withinUnique = batch.map(_._2).distinct
    val kept = withinUnique.filterNot(corpusSet.contains)

    val r = Incremental.incrementalDedup(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_batch") == batch.length.toLong)
    assert(r.getAs[Long]("n_within_unique") == withinUnique.length.toLong)
    assert(r.getAs[Long]("n_within_dups")
      == (batch.length - withinUnique.length).toLong)
    assert(r.getAs[Long]("n_kept") == kept.length.toLong)
    assert(r.getAs[Long]("n_corpus_dups")
      == (withinUnique.length - kept.length).toLong)
  }

  test("attribution: each day's totals replay from per-purchase as-of logic") {
    val evs = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("us"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .collect()
    case class Ev(user: Long, id: Long, typ: String, value: Double,
      us: Long, day: String)
    val es = evs.map(r => Ev(r.getLong(0), r.getLong(1), r.getString(2),
      r.getDouble(3), r.getLong(4), r.getString(5)))
    val byUser = es.groupBy(_.user)
    var nAttr = 0L; var nPur = 0L
    val perDay = scala.collection.mutable.Map[String, (Long, Long)]()
    byUser.values.foreach { ues =>
      val sorted = ues.sortBy(e => (e.us, if (e.typ == "view") 0 else 1, e.id))
      var lastView = Long.MinValue
      sorted.foreach { e =>
        if (e.typ == "view") lastView = e.us
        else {
          nPur += 1
          val attr = lastView != Long.MinValue &&
            e.us - lastView <= Behavior.AttribWindowSec * 1000000L
          if (attr) nAttr += 1
          val (p, a) = perDay.getOrElse(e.day, (0L, 0L))
          perDay(e.day) = (p + 1, a + (if (attr) 1L else 0L))
        }
      }
    }
    val rows = Behavior.lastTouchAttribution(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == nPur)
    assert(rows.map(_.getAs[Long]("n_attributed")).sum == nAttr)
    rows.foreach { r =>
      val (p, a) = perDay(r.getAs[String]("day"))
      assert(r.getAs[Long]("n_purchases") == p)
      assert(r.getAs[Long]("n_attributed") == a)
    }
    assert(nAttr > 0 && nAttr < nPur,
      "test data exercised only one attribution branch")
  }

  test("fetch plan: per-domain serialization and LPT makespan bound") {
    import graft.ops.Robots
    val rows = Robots.fetchPlan(spark, sfDir).collect()
    assert(rows.length == 20)
    // politeness serializes within a domain: serial = n_urls * delay
    rows.foreach { r =>
      assert(r.getAs[Long]("serial_s") ==
        r.getAs[Long]("n_urls") * r.getAs[Long]("crawl_delay_s"))
      assert((1L to 5L).contains(r.getAs[Long]("crawl_delay_s")))
    }
    // makespan lower bound = max(longest domain, ceil(total / slots)),
    // identical on every row (1-row broadcast aggregate)
    val serials = rows.map(_.getAs[Long]("serial_s"))
    val expect = math.max(serials.max,
      math.ceil(serials.sum.toDouble / Robots.FetchSlots).toLong)
    assert(rows.map(_.getAs[Long]("makespan_lb_s")).distinct.toSeq
      == Seq(expect))
    // the long-pole domain owns the largest bottleneck share, and no
    // share exceeds 1 (nothing can beat the lower bound)
    val shares = rows.map(_.getAs[Double]("bottleneck_share"))
    assert(shares.forall(s => s > 0 && s <= 1.0))
    assert(shares.max == shares(serials.indexOf(serials.max)))
  }

  test("parseRules extracts crawl-delay directives per agent group") {
    import graft.ops.Robots
    val delays = Robots.parseRules(Robots.robotsTxt(spark),
      Seq("crawl-delay")).collect()
    // only the '*' group declares a delay in the synthetic corpus
    assert(delays.nonEmpty)
    assert(delays.forall(_.getAs[String]("agent") == "*"))
    assert(delays.forall(r =>
      (1 to 5).contains(r.getAs[String]("prefix").toInt)))
    // and the default directive filter still excludes it
    val rules = Robots.parseRules(Robots.robotsTxt(spark)).collect()
    assert(rules.forall(r => Set("allow", "disallow")
      .contains(r.getAs[String]("rule"))))
  }
}
