package graft

import graft.ops.SpanCorrupt
import org.apache.spark.sql.functions._

/** q227 span corruption: the emitted (input, target) pair must equal
  * a from-scratch driver replay of the systematic masking rule, the
  * pair must RECONSTRUCT the original token stream exactly (nothing
  * lost, nothing invented), the corruption rate must be pinned at
  * Span/Block over the blocked region, and the transform must stay
  * scan-local (no exchange before the presentation sort). */
class SpanCorruptSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)
  private def toks(text: String): Vector[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toVector

  private val B = SpanCorrupt.Block
  private val L = SpanCorrupt.Span

  /** The systematic rule, re-derived independently. */
  private def replay(docId: Long, text: String)
      : (Long, Long, String, String) = {
    val t = toks(text)
    val nblk = t.length / B
    val starts = (0 until nblk).map(b =>
      b * B + (hash60(s"sc${docId}_$b") % (B - L + 1)).toInt)
    val inp = Vector.newBuilder[String]
    var i = 0
    while (i < t.length) {
      val blk = i / B
      if (blk >= nblk) { inp += t(i); i += 1 }
      else if (i == starts(blk)) { inp += s"<extra_id_$blk>"; i += L }
      else { inp += t(i); i += 1 }
    }
    val tgt = (0 until nblk).flatMap(b =>
      s"<extra_id_$b>" +: t.slice(starts(b), starts(b) + L)) :+
      s"<extra_id_$nblk>"
    (nblk.toLong, (nblk * L).toLong, inp.result().mkString(" "),
      tgt.mkString(" "))
  }

  test("pairs equal a from-scratch replay of the systematic rule") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val got = SpanCorrupt.spanCorrupt(spark, sfDir).collect()
    assert(got.length === docs.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (spans, masked, inp, tgt) = replay(id, docs(id))
      assert(r.getAs[Long]("n_tokens") === toks(docs(id)).length.toLong)
      assert(r.getAs[Long]("n_spans") === spans, s"doc $id")
      assert(r.getAs[Long]("n_masked") === masked, s"doc $id")
      assert(r.getAs[String]("input_text") === inp, s"doc $id")
      assert(r.getAs[String]("target_text") === tgt, s"doc $id")
    }
  }

  test("input + target reconstruct the original tokens exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val sentinel = "<extra_id_(\\d+)>".r
    SpanCorrupt.spanCorrupt(spark, sfDir).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // target spans keyed by sentinel index; the terminal sentinel
      // closes the last span
      val tgtToks = r.getAs[String]("target_text").split(" ").toVector
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      tgtToks.foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Vector.empty
        case w => spans(cur) = spans(cur) :+ w
      }
      val rebuilt = r.getAs[String]("input_text").split(" ").toVector
        .filter(_.nonEmpty).flatMap {
          case sentinel(k) => spans(k.toInt)
          case w => Vector(w)
        }
      assert(rebuilt === toks(docs(id)), s"doc $id reconstruction")
      // every masked span is exactly L tokens; the terminal sentinel
      // carries none
      val nblk = r.getAs[Long]("n_spans").toInt
      (0 until nblk).foreach(b => assert(spans(b).length === L,
        s"doc $id span $b length"))
      assert(spans(nblk).isEmpty, s"doc $id terminal sentinel")
    }
  }

  test("corruption rate is pinned at Span/Block over blocked tokens") {
    val rows = SpanCorrupt.spanCorrupt(spark, sfDir)
      .agg(sum(col("n_masked")).as("masked"),
        sum(col("n_spans") * SpanCorrupt.Block).as("blocked"))
      .head()
    val rate = rows.getAs[Long]("masked").toDouble /
      rows.getAs[Long]("blocked")
    assert(math.abs(rate - L.toDouble / B) < 1e-12)
  }

  test("plan: scan-local — no exchange before the presentation sort") {
    val p = SpanCorrupt.spanCorrupt(spark, sfDir)
      .queryExecution.executedPlan.toString
    // exactly the sort's range exchange and nothing else: the
    // transform itself never shuffles a corpus-proportional relation
    val exchanges = "Exchange [a-z]+partitioning".r
      .findAllIn(p).toList
    assert(exchanges.size <= 1, s"unexpected exchanges:\n$p")
    assert(!p.contains("BroadcastExchange"), s"broadcast crept in:\n$p")
  }
}
