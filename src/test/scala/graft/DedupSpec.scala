package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup finds exactly the planted upper-case copies") {
    val row = Dedup.exactDedup(spark, sfDir).collect().head
    val planted = Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id", lit(7)) === 0).count()
    assert(row.getAs[Long]("docs_removed") === planted)
    assert(row.getAs[Long]("dup_groups") === planted)
    assert(row.getAs[Long]("total_docs") ===
      row.getAs[Long]("distinct_docs") + planted)
  }

  test("jaccardPairs finds every planted near-dup at high similarity") {
    val pairs = Dedup.jaccardPairs(spark, sfDir).collect()
    val planted = Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id", lit(10)) === 0)
      .select("doc_id").as[Long].collect()
    // every planted (orig, orig+100000) pair surfaces with high overlap
    // (other organically-similar pairs may surface too — that's correct)
    val pairSet = pairs.map(r =>
      (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    planted.foreach { id => assert(pairSet.contains((id, id + 100000))) }
    pairs.filter(r => r.getAs[Long]("b_id") === r.getAs[Long]("a_id") + 100000)
      .foreach(r => assert(r.getAs[Double]("jaccard") >= 0.6))
  }

  test("minhashLsh recovers the planted pairs jaccardPairs finds") {
    val exact = Dedup.jaccardPairs(spark, sfDir)
      .filter($"b_id" >= 100000 && $"jaccard" >= 0.6)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup.minhashLsh(spark, sfDir)
      .filter($"b_id" >= 100000)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // LSH with 4 bands of 4 at jaccard≈0.9 has ≳99.9% recall
    assert(exact.subsetOf(lsh) || (exact -- lsh).size <= exact.size / 10)
  }

  test("simhash assigns close hashes to planted near-dups") {
    val planted = Dedup.simhashPairs(spark, sfDir)
      .filter($"b_id" === $"a_id" + 100000).collect()
    assert(planted.nonEmpty)
    planted.foreach(r => assert(r.getAs[Long]("hamming") <= 6))
  }

  /** Independent recomputation of the near-dup corpus's simhash
    * table (same construction as [[Dedup.simhashPairs]]'s internals,
    * rebuilt here so the operator is checked against a second
    * derivation). */
  private def bruteSimhashTable = {
    import graft.functions.TextOps
    val hs = array_distinct(transform(TextOps.tokens($"text"),
      t => TextOps.hash60(t)))
    val sim = (0 until 32).map { j =>
      when(aggregate($"hs", lit(0L),
        (acc, h) => acc + when(shiftright(h, j) % 2 === 1, 1L)
          .otherwise(-1L)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .unionByName(Tables.documents(spark, sfDir)
        .filter(pmod($"doc_id", lit(10)) === 0)
        .select(($"doc_id" + 100000).as("doc_id"),
          concat($"text", lit(" near dup tail")).as("text")))
      .select($"doc_id", hs.as("hs")).withColumn("simhash", sim)
      .select("doc_id", "simhash")
  }

  test("simhash multi-probe: every Hamming<=3 pair is found (pigeonhole)") {
    // brute-force ground truth at this SF, then assert the banded
    // candidate scheme cannot miss a pair with <=3 differing bits
    // (4 bands of 8: three flips leave at least one band untouched)
    val pairs = Dedup.simhashPairs(spark, sfDir)
      .select("a_id", "b_id", "hamming").collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = bruteSimhashTable.cache()
    val close = d.as("a").crossJoin(d.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter($"hamming" <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(close.subsetOf(found),
      s"missed guaranteed pairs: ${(close -- found).take(5)}")
  }

  test("simhash banding: candidate volume equals the bucket-size prediction") {
    // Σ over (band, key) buckets of C(n, 2) IS the candidate count
    // the banding scheme pays before distinct/verify — the quantity
    // that is inherently quadratic in duplicate-CLUSTER size. This
    // pins the banding prediction so the design boundary is explicit:
    // at a 100× corpus the emitted pair set grows with the square of
    // cluster sizes (q25's 5.6M rows at sf0.1 are the pair set, not a
    // bug), and the scale mitigation is group-level output (q53), not
    // pair-level.
    val d = bruteSimhashTable.cache()
    val banded = d.select($"doc_id", explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright($"simhash", 8 * b).bitwiseAND(lit(255L)).as("key"))
      }: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.key".as("key"))
    val predicted = banded.groupBy("band", "key")
      .agg(count(lit(1)).as("n"))
      .agg(sum(($"n" * ($"n" - 1) / 2).cast("long")))
      .as[Long].head()
    val rawCandidates = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.key" === $"b.key"
          && $"a.doc_id" < $"b.doc_id")
      .count()
    assert(rawCandidates === predicted,
      s"banding bound broken: $rawCandidates candidates vs $predicted predicted")
    // distinct candidates and verified pairs can only shrink from there
    val emitted = Dedup.simhashPairs(spark, sfDir).count()
    assert(emitted <= rawCandidates)
    info(s"banding: $predicted raw candidates -> $emitted verified pairs")
  }

  test("embeddingNearDup finds all planted perturbed vectors") {
    val pairs = Similarity.embeddingNearDup(spark, sfDir).collect()
    val planted = Tables.documents(spark, sfDir)
      .filter(pmod($"doc_id", lit(20)) === 0).count()
    val plantedPairs = pairs.filter(r =>
      r.getAs[Long]("b_id") === r.getAs[Long]("a_id") + ops.Planted.familyOffset(spark, sfDir, 1, "spec"))
    assert(plantedPairs.length === planted)
    plantedPairs.foreach(r =>
      assert(r.getAs[Double]("sim") >= Similarity.SimThreshold))
  }

  test("knn brute force: no self-matches, ranks descending") {
    val rows = Similarity.knnBruteForce(spark, sfDir).collect()
    assert(rows.length === 9)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      rs.foreach(r => assert(r.getAs[Long]("n_id") !== q))
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("large-star/small-star components agree with the min-label loop") {
    import graft.ops.Components
    // two independent algorithms over the same pair graph must emit
    // the exact same group-size/canonical-sum summary
    val label = Components.dedupGroupsMinLabel(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("sz"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("canonical_sum"))).toSet
    val star = Components.dedupGroupsStar(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("sz"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("canonical_sum"))).toSet
    assert(star === label)
    assert(star.nonEmpty)
  }
}
