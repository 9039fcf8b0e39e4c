package graft

import org.apache.spark.sql.functions._

import graft.expressions.HyperplaneBands
import graft.functions.VectorOps
import graft.ops.Similarity

/** The 1024-d similarity family: the native banded-LSH signature is
  * pinned to its literal-dot formulation, and the approximate
  * operators (near-dup blocking, PQ-ANN) are measured against brute
  * force — recall claims in the Scaladoc are enforced here, not
  * asserted on faith.
  */
class SimilaritySpec extends SparkSpec {

  test("native hyperplane bands ≡ literal-dot formulation") {
    val e = Corpus.docEmbeddings(spark, sfDir)
      .filter(col("vec_id") < 50).localCheckpoint()
    val native = e.select(col("vec_id"),
      HyperplaneBands.bands(col("v"),
        Similarity.NHyperplanes, Similarity.BandBits).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // the reference formulation: one literal-plane dot per sign bit
    val keyCols = (0 until Similarity.NBands).map { b =>
      (0 until Similarity.BandBits).map { k =>
        val j = b * Similarity.BandBits + k
        (VectorOps.dot(col("v"), typedlit(Similarity.hyperplanes(j))) >= 0)
          .cast("int") * lit(1 << k)
      }.reduce(_ + _)
    }
    val literal = e.select(col("vec_id"), array(keyCols: _*).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(native === literal)
  }

  test("near-dup blocking finds every planted pair and every brute-force pair at ≥ 0.99") {
    val corpus = Similarity.nearDupCorpus(spark, sfDir)
    val found = Similarity.embeddingNearDup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over all pairs
    val a = corpus.select(col("vec_id").as("a_id"), col("v").as("va"),
      col("nrm").as("na"))
    val b = corpus.select(col("vec_id").as("b_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val denom = col("na") * col("nb")
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("sim", when(denom === 0.0, lit(0.0))
        .otherwise(VectorOps.dot(col("va"), col("vb")) / denom))
      .filter(col("sim") >= 0.99)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: every perturbed copy pairs with its source at cos≈0.9999
    val planted = corpus.filter(col("vec_id") >= ops.Planted.familyOffset(spark, sfDir, 1, "spec"))
      .select(col("vec_id")).collect()
      .map(_.getLong(0)).map(p => (p - ops.Planted.familyOffset(spark, sfDir, 1, "spec"), p)).toSet
    assert(planted.subsetOf(found),
      s"missing planted pairs: ${(planted -- found).take(5)}")
    assert(brute.subsetOf(found),
      s"missing ≥0.99 pairs: ${(brute -- found).take(5)}")
  }

  test("learned-IVF top-3 overlaps the exact brute-force top-3") {
    val exact = ops.Similarity.knnBruteForce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = ops.KMeans.knnIvf1024(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (exact & ivf).size
    info(s"IVF recall = $overlap/${exact.size}")
    // nprobe/nlist = 2/10: neighbors outside the probed lists are the
    // accepted trade; at sf0.01 the measured recall is 7/9
    assert(overlap >= exact.size / 2,
      s"IVF found $ivf vs exact $exact — overlap $overlap")
  }

  test("PQ-ANN top-10 overlaps exact brute-force top-10") {
    val e = Corpus.docEmbeddings(spark, sfDir).localCheckpoint()
    val q = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val exact = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("d2", VectorOps.dot(col("v"), col("v"))
        - lit(2.0) * VectorOps.dot(col("v"), col("qv"))
        + VectorOps.dot(col("qv"), col("qv")))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val approx = ops.PQ.pqAnn(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exact & approx).size
    info(s"recall@10 = $overlap/10")
    assert(overlap >= 5,
      s"ADC top-10 $approx overlaps exact $exact in only $overlap")
  }
}
