package graft

import graft.ops.Intervals
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Sweep-line peak-concurrency contract (q206): the half-open tie
  * convention, midnight clipping, a brute-force replay of the daily
  * peaks, and the report's internal consistency. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def collectPeaks(daily: org.apache.spark.sql.DataFrame) =
    daily.select(col("event_type"), col("day").cast("string"), col("peak"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap

  private def peaks(iv: Seq[(String, Timestamp, Timestamp)]) =
    collectPeaks(Intervals.dailyPeaks(iv.toDF("event_type", "s", "e")))

  test("half-open convention: touching intervals never overlap") {
    val p = peaks(Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      ("a", ts("2024-01-01 10:10:00"), ts("2024-01-01 10:20:00"))))
    assert(p === Map(("a", "2024-01-01") -> 1L))
  }

  test("genuine overlap counts; peak is the max, not the last") {
    val p = peaks(Seq(
      ("a", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00")),
      ("a", ts("2024-01-01 10:05:00"), ts("2024-01-01 10:15:00")),
      ("a", ts("2024-01-01 12:00:00"), ts("2024-01-01 12:01:00"))))
    assert(p === Map(("a", "2024-01-01") -> 2L))
  }

  test("an interval ending EXACTLY at midnight is closed out of the next day") {
    val p = peaks(Seq(
      ("a", ts("2024-01-01 23:41:00"), ts("2024-01-02 00:00:00"))))
    assert(p === Map(("a", "2024-01-01") -> 1L),
      "half-open [s, e): no phantom next-day row for a zero-length segment")
  }

  test("a midnight-crossing interval is open in BOTH days' sweeps") {
    val p = peaks(Seq(
      ("a", ts("2024-01-01 23:50:00"), ts("2024-01-02 00:20:00")),
      ("a", ts("2024-01-02 00:10:00"), ts("2024-01-02 00:15:00"))))
    assert(p === Map(
      ("a", "2024-01-01") -> 1L,
      ("a", "2024-01-02") -> 2L))
  }

  test("simultaneous starts aggregate as peers (no order-dependence)") {
    val t0 = ts("2024-01-01 09:00:00")
    val p = peaks(Seq(
      ("a", t0, ts("2024-01-01 09:30:00")),
      ("a", t0, ts("2024-01-01 09:20:00")),
      ("a", t0, ts("2024-01-01 09:10:00"))))
    assert(p === Map(("a", "2024-01-01") -> 3L))
  }

  test("daily peaks match a brute-force overlap count on real data") {
    val iv = Tables.events(spark, sfDir).select(
      col("event_type"), col("ts").as("s"),
      (col("ts") + expr(
        "make_interval(0, 0, 0, 0, 0, CAST(1 + event_id % 59 AS INT), 0)"))
        .as("e"))
    val rows = iv.collect().map(r =>
      (r.getString(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
    val DayMs = 86400000L
    // brute force: clip each interval to each day it touches, then for
    // every start boundary t count segments with seg_s <= t < seg_e
    val segs = rows.flatMap { case (typ, s, e) =>
      Seq(s / DayMs, e / DayMs).distinct.map { day =>
        (typ, day, math.max(s, day * DayMs), math.min(e, (day + 1) * DayMs))
      }
    }
    val want = segs.groupBy { case (typ, day, _, _) => (typ, day) }.map {
      case ((typ, day), group) =>
        val peak = group.map { case (_, _, t, _) =>
          group.count { case (_, _, ss, ee) => ss <= t && t < ee }
        }.max
        ((typ, java.time.LocalDate.ofEpochDay(day).toString), peak.toLong)
    }
    val got = collectPeaks(Intervals.dailyPeaks(iv))
    assert(got === want)
  }

  test("q206 report is internally consistent") {
    val out = Intervals.peakConcurrency(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (nDays, peakMax, avg) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      assert(nDays > 0 && peakMax >= 1)
      assert(avg >= 1.0 && avg <= peakMax.toDouble)
      assert(r.getDate(3) != null)
    }
  }
}
