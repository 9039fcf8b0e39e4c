package graft

import graft.ops.Coreset

/** q236 — greedy k-center coreset selection (Gonzalez trace). */
class CoresetSpec extends SparkSpec {

  private lazy val vecs: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    // the op's ladder: xx − 2·dot + cc from left-to-right double dots,
    // rounded 9, clamped at 0
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).foldLeft(0.0) { case (s, (p, q)) => s + p * q }
    val raw = dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    math.max(0.0, BigDecimal(raw)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("selection trace matches a from-scratch greedy replay") {
    val byId = vecs.toMap
    var selected = Vector(0L)
    var dmin = vecs.map { case (id, v) => id -> d2(v, byId(0L)) }.toMap
    var expect = Vector[(Long, Long, Option[Double])]((1L, 0L, None))
    for (step <- 2 to Coreset.K) {
      val (nid, nd) = dmin.toSeq.minBy { case (id, d) => (-d, id) }
      expect :+= ((step.toLong, nid, Some(nd)))
      selected :+= nid
      dmin = dmin.map { case (id, d) =>
        id -> math.min(d, d2(byId(id), byId(nid))) }
    }
    val got = Coreset.kCenter(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    assert(got.length == Coreset.K)
    got.zip(expect).foreach { case ((s, id, d), (es, eid, ed)) =>
      assert(s == es && id == eid, s"step $es: picked $id, expected $eid")
      (d, ed) match {
        case (Some(x), Some(y)) =>
          val ey = BigDecimal(math.sqrt(y))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(x == ey, s"step $es dist $x != $ey")
        case (None, None) =>
        case _ => fail(s"step $es: null mismatch ($d vs $ed)")
      }
    }
  }

  test("the coverage radius is non-increasing along the trace") {
    val dists = Coreset.kCenter(spark, sfDir).collect()
      .flatMap(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    dists.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius increased: $a -> $b")
    }
    assert(dists.forall(_ >= 0.0))
  }

  test("selected ids are distinct (no center picked twice)") {
    val ids = Coreset.kCenter(spark, sfDir).collect().map(_.getLong(1))
    assert(ids.distinct.length == ids.length, s"duplicate centers: ${ids.toSeq}")
  }
}
