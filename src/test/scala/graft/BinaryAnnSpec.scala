package graft

import graft.Corpus
import graft.ops.BinaryAnn
import org.apache.spark.sql.functions._

/** Binary-quantization contract (q201): the packed sign codes must
  * encode exactly the vector's sign pattern, packed Hamming must
  * equal the direct sign-disagreement count, and the two-stage
  * rerank's candidates must be the true Hamming top-R. */
class BinaryAnnSpec extends SparkSpec {
  import spark.implicits._

  test("signPack packs MSB-first: dim 64w+i lands at bit 63-i of word w") {
    // one vector: positive at dims 0, 63, 64, 1023; negative elsewhere
    val v = Array.tabulate(1024)(i =>
      if (Set(0, 63, 64, 1023).contains(i)) 1.0 else -1.0)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(BinaryAnn.signPack(col("v")).as("code"))
      .as[Seq[Long]].head()
    assert(got.length === BinaryAnn.Words)
    assert(got(0) === ((1L << 63) | 1L)) // dims 0 and 63
    assert(got(1) === (1L << 63))        // dim 64
    assert(got(15) === 1L)               // dim 1023
    assert(got.slice(2, 15).forall(_ === 0L))
  }

  test("native signPack equals the HOF reference on random vectors") {
    val rnd = new scala.util.Random(11)
    val vs = Seq.fill(20)(Tuple1(Array.fill(1024)(rnd.nextDouble() - 0.5)))
    val both = vs.toDF("v").select(
      BinaryAnn.signPack(col("v")).as("a"),
      BinaryAnn.signPackHof(col("v")).as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(both.forall { case (a, b) => a == b })
  }

  test("native signPack matches the HOF (SQL NaN semantics) on NaN/zero/-0.0 elements") {
    // NaN orders greater than everything in SQL comparisons, so its
    // sign bit is 1 in BOTH formulations; 0.0 and -0.0 both compare
    // >= 0 (SQL equates them)
    val v = Array.tabulate(1024) {
      case 0 => Double.NaN
      case 1 => 0.0
      case 2 => -0.0
      case i => if (i % 2 == 0) 1.0 else -1.0
    }
    val row = Seq(Tuple1(v)).toDF("v")
      .select(BinaryAnn.signPack(col("v")).as("a"),
        BinaryAnn.signPackHof(col("v")).as("b"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(row._1 === row._2)
    // and the NaN/zero bits are actually set
    assert((row._1.head >>> 61) === 7L, "dims 0-2 must all pack as 1")
  }

  test("native signPack is NULL on a length not divisible by 64") {
    val got = Seq(Tuple1(Array.fill(100)(1.0))).toDF("v")
      .select(BinaryAnn.signPack(col("v"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("packed Hamming equals the direct sign-disagreement count") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(12) {
      (Array.fill(1024)(rnd.nextDouble() - 0.5),
        Array.fill(1024)(rnd.nextDouble() - 0.5))
    }
    val got = pairs.toDF("a", "b")
      .select(BinaryAnn.hamming(
        BinaryAnn.signPack(col("a")), BinaryAnn.signPack(col("b"))).as("h"))
      .as[Long].collect()
    val want = pairs.map { case (a, b) =>
      a.zip(b).count { case (x, y) => (x >= 0) != (y >= 0) }.toLong
    }
    assert(got.toSeq === want)
    assert(want.exists(_ > 400), "random signs should disagree ~half the time")
  }

  test("q201 neighbors carry true Hamming distances and honor the top-R gate") {
    val out = BinaryAnn.hammingRerank(spark, sfDir).collect()
    assert(out.length === BinaryAnn.NQ * BinaryAnn.K)
    // recompute Hamming directly from the sign pattern for each
    // reported (q, n) pair and check the audit column
    val vecs = Corpus.docEmbeddings(spark, sfDir)
      .as[(Long, Seq[Double])].collect().toMap
    val allHams = (qid: Long) => vecs.collect {
      case (id, v) if id != qid =>
        id -> v.zip(vecs(qid)).count { case (x, y) => (x >= 0) != (y >= 0) }.toLong
    }.toSeq
    for (r <- out) {
      val (q, n, ham) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val direct = allHams(q).toMap.apply(n)
      assert(ham === direct, s"q=$q n=$n")
      // the neighbor must sit inside the deterministic Hamming top-R
      val gate = allHams(q).sortBy { case (id, h) => (h, id) }
        .take(BinaryAnn.CandR).map(_._1).toSet
      assert(gate.contains(n), s"neighbor $n of q=$q outside Hamming top-R")
    }
    // ranks are 1..K per query, sims non-increasing within a query
    for ((_, rows) <- out.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to BinaryAnn.K))
      val sims = sorted.map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
