package graft

import graft.ops.Decontaminate
import org.apache.spark.sql.functions._

/** q226 Bloom decontamination: the census must equal a from-scratch
  * driver replay of the filter (same md5 position rule), the Bloom
  * no-false-negative contract must hold, and the bitmap must stay
  * bounded and broadcast while the exact-truth join stays partitioned
  * at scale. */
class DecontaminateSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16)
  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq
  private def grams(text: String): Set[String] = {
    val t = toks(text)
    if (t.length < 3) Set(t.mkString(" "))
    else t.sliding(3).map(_.mkString(" ")).toSet
  }
  private def positions(gram: String): Seq[Long] =
    (0 until Decontaminate.K).map(i =>
      hash60(s"bf${i}_$gram") % Decontaminate.M)

  test("census equals a from-scratch driver replay of the filter") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val evalGrams = docs.filter(_._1 % Decontaminate.EvalEvery == 0)
      .flatMap(d => grams(d._3)).toSet
    val bf = evalGrams.flatMap(positions)
    val train = docs.filter(_._1 % Decontaminate.EvalEvery != 0)
    case class Row(src: String, docs: Long, fDocs: Long, tDocs: Long,
      grams: Long, fGrams: Long, tGrams: Long, fp: Long, fn: Long)
    val expected = train.groupBy(_._2).map { case (src, ds) =>
      val perDoc = ds.map { case (_, _, text) =>
        val gs = grams(text)
        val flagged = gs.filter(g => positions(g).forall(bf))
        val tru = gs.filter(evalGrams)
        (gs.size, flagged.size, tru.size, (flagged -- tru).size,
          (tru -- flagged).size)
      }
      src -> Row(src, ds.length,
        perDoc.count(_._2 > 0), perDoc.count(_._3 > 0),
        perDoc.map(_._1.toLong).sum, perDoc.map(_._2.toLong).sum,
        perDoc.map(_._3.toLong).sum, perDoc.map(_._4.toLong).sum,
        perDoc.map(_._5.toLong).sum)
    }
    val got = Decontaminate.decontaminate(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val e = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === e.docs)
      assert(r.getAs[Long]("n_flagged_docs") === e.fDocs)
      assert(r.getAs[Long]("n_true_docs") === e.tDocs)
      assert(r.getAs[Long]("n_grams") === e.grams)
      assert(r.getAs[Long]("n_flagged_grams") === e.fGrams)
      assert(r.getAs[Long]("n_true_grams") === e.tGrams)
      assert(r.getAs[Long]("n_fp_grams") === e.fp)
      assert(r.getAs[Long]("n_fn_grams") === e.fn)
    }
  }

  test("the Bloom contract: zero false negatives, flagged ⊇ true") {
    val rows = Decontaminate.decontaminate(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fn_grams") === 0L,
        s"${r.getAs[String]("source")}: a contaminated gram escaped")
      assert(r.getAs[Long]("n_flagged_grams") >=
        r.getAs[Long]("n_true_grams"))
      assert(r.getAs[Long]("n_flagged_docs") >=
        r.getAs[Long]("n_true_docs"))
    }
  }

  test("plan: the bitmap broadcasts; it is bounded by construction") {
    // the bf relation can never exceed Words rows whatever the eval
    // set holds — the q88 bounded-broadcast class
    assert(Decontaminate.M === Decontaminate.Words.toLong *
      Decontaminate.WordBits)
    assert(Decontaminate.WordBits <= 62, "a shift would wrap sign")
    val p = Decontaminate.decontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"bitmap join lost its broadcast:\n$p")
  }
}
