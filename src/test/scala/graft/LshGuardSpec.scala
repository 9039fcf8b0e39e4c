package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The q27 LSH density self-guard (VERDICT r11 #2): the declared SF
  * keeps the declared geometry (so the oracle is untouched), a
  * tightened budget walks the recall-matched ladder, and the staged
  * dense regime — where density is true-duplicate mass that no
  * geometry can thin — fails loudly at the default budget. */
class LshGuardSpec extends SparkSpec {

  test("declared SF keeps the declared geometry — q27 oracle unchanged") {
    val corpus = Similarity.nearDupCorpus(spark, sfDir)
    val g = Similarity.chooseGeometry(corpus)
    assert(g.planes === Similarity.NHyperplanes)
    assert(g.bits === Similarity.BandBits)
    assert(g.widenedFrom.isEmpty)
    assert(g.candPairs <= Similarity.MaxCandPairsPerVector * g.n)
  }

  test("a tightened budget widens along the recall-matched ladder") {
    // measured at sf0.001: 12.6 pairs/vector at (128,16), 6.9 at
    // (240,20) — a budget of 8/vector forces exactly one widening
    val corpus = Similarity.nearDupCorpus(spark, sfDir)
    val g = Similarity.chooseGeometry(corpus, budgetPerVector = 8L)
    assert(g.planes === 240 && g.bits === 20)
    assert(g.widenedFrom === Seq((Similarity.NHyperplanes,
      Similarity.BandBits)))
    assert(g.candPairs <= 8L * g.n)
  }

  test("staged dense regime fails loudly at the default budget") {
    // every vector identical: all 8 bands collapse to one bucket,
    // C(200,2)·bands ≈ 796/vector at EVERY rung — widening thins
    // chance collisions, never true duplicates, so the guard must
    // refuse rather than run a quadratic pair output
    val v = Seq.fill(Similarity.Dims)(1.0 / math.sqrt(Similarity.Dims))
    val dense = spark.range(0, 200).toDF("vec_id")
      .withColumn("v", typedLit(v))
      .withColumn("nrm", lit(1.0))
    val e = intercept[IllegalStateException] {
      Similarity.chooseGeometry(dense)
    }
    assert(e.getMessage.contains("irreducible"))
    assert(e.getMessage.contains("q22/q53"))
  }

  test("census arithmetic matches a driver-side replay at sf0.001") {
    import graft.expressions.HyperplaneBands
    val corpus = Similarity.nearDupCorpus(spark, sfDir)
    val sigs = corpus.select(col("vec_id"), HyperplaneBands.bands(
        col("v"), Similarity.NHyperplanes, Similarity.BandBits).as("bs"))
      .collect()
      .map(r => r.getSeq[Long](1))
    val byBucket = sigs.flatMap(_.zipWithIndex)
      .groupBy(identity).view.mapValues(_.length.toLong)
    val expected = byBucket.values.map(c => c * (c - 1) / 2).sum
    val measured = Similarity.censusCandPairs(corpus,
      Similarity.NHyperplanes, Similarity.BandBits)
    assert(measured === expected)
  }
}
