package graft

import graft.ops.Warc

/** The WARC container codec: the writer must produce files whose
  * record walk recovers exactly the closed-form record definitions
  * through BOTH framings (plain and per-record gzip members); the
  * reader must enforce the framing invariants loudly; and the q142
  * rollup must match a from-scratch replay over the key set.
  */
class WarcSpec extends SparkSpec {

  test("record walk recovers the closed-form records, plain and gzip") {
    for (fileId <- Seq(0L, 1L, 2L, 3L)) { // both gzip parities
      val keys = (fileId * Warc.RecordsPerFile until
        fileId * Warc.RecordsPerFile + Warc.RecordsPerFile).toSeq
      val bytes = Warc.encodeWarc(fileId, keys)
      if (Warc.gzipped(fileId)) // gzip magic actually present
        assert((bytes(0) & 0xff) === 0x1f && (bytes(1) & 0xff) === 0x8b)
      val records = Warc.decodeWarc(bytes)
      assert(records.head.warcType === "warcinfo")
      val responses = records.filter(_.warcType == "response")
      val requests = records.filter(_.warcType == "request")
      assert(responses.map(_.targetUri) === keys.map(Warc.uri))
      assert(requests.map(_.targetUri) === keys.filter(Warc.hasRequest).map(Warc.uri))
      responses.zip(keys).foreach { case (r, k) =>
        assert(r.httpStatus === Warc.status(k), s"key $k status")
        assert(r.bodyBytes === Warc.bodyLen(k), s"key $k body")
      }
      // records interleave request-before-response where defined
      val seq = records.map(_.warcType)
      keys.filter(Warc.hasRequest).foreach { k =>
        val i = records.indexWhere(r => r.warcType == "request" && r.targetUri == Warc.uri(k))
        assert(records(i + 1).warcType === "response")
        assert(records(i + 1).targetUri === Warc.uri(k))
      }
      assert(seq.count(_ == "warcinfo") === 1)
    }
  }

  test("gzip and plain framings of the same records decode identically") {
    val keys = Seq(10L, 11L, 12L)
    // fileId parity selects the framing; same keys either way
    val plain = Warc.decodeWarc(Warc.encodeWarc(1L, keys))
    val gz = Warc.decodeWarc(Warc.encodeWarc(2L, keys))
    assert(plain === gz)
  }

  test("walker rejects malformed input loudly") {
    val good = Warc.encodeWarc(1L, Seq(5L, 6L)) // plain framing
    intercept[IllegalArgumentException](
      Warc.decodeWarc(good.take(good.length - 3))) // clipped terminator
    val notWarc = good.clone(); notWarc(0) = 'X'.toByte
    intercept[IllegalArgumentException](Warc.decodeWarc(notWarc))
    // strip the Content-Length header from the first record
    val text = new String(good, "US-ASCII")
    val broken = text.replaceFirst("Content-Length: \\d+\r\n", "")
    intercept[IllegalArgumentException](
      Warc.decodeWarc(broken.getBytes("US-ASCII")))
  }

  test("q142 fetch health matches a from-scratch replay") {
    val got = Warc.fetchHealth(spark, sfDir).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_responses"), r.getAs[Long]("n_ok"),
          r.getAs[Long]("n_err"), r.getAs[Long]("body_bytes"),
          r.getAs[Long]("from_gzip"))).toMap
    val keys = Tables.customer(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0))
    assert(keys.nonEmpty)
    val expected = keys.groupBy(Warc.domain).map { case (dom, ks) =>
      dom -> (ks.length.toLong,
        ks.count(k => Warc.status(k) == 200).toLong,
        ks.count(k => Warc.status(k) >= 400).toLong,
        ks.map(k => Warc.bodyLen(k).toLong).sum,
        ks.count(k => Warc.gzipped(Warc.fileOf(k))).toLong)
    }
    assert(got === expected)
    // the carve exercises both framings and both health classes
    assert(got.values.map(_._5).sum > 0)
    assert(got.values.map(_._3).sum > 0)
  }
}
