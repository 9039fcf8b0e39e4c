package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** q148 contracts: the training order is a pure function of
  * (epoch, doc_id) — identical under any physical partitioning — and
  * epochs genuinely permute relative to each other. */
class EpochShuffleSpec extends SparkSpec {

  test("order is deterministic across partitionings") {
    val a = Sampling.epochShuffle(spark, sfDir).collect().toSeq
    // same computation with the input scrambled across 17 partitions
    val shuffled = Tables.documents(spark, sfDir).repartition(17)
    val tmp = java.nio.file.Files.createTempDirectory("es").toString
    shuffled.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // copy nothing else: epochShuffle reads only documents
    val b = Sampling.epochShuffle(spark, tmp).collect().toSeq
    assert(a == b, "permutation depends on physical layout")
  }

  test("epochs decorrelate: no shard keeps the same head doc in all three epochs") {
    val rows = Sampling.epochShuffle(spark, sfDir)
      .select(col("epoch"), col("shard"), col("head_doc"), col("order_checksum"))
      .collect()
    val byEpoch = rows.groupBy(_.getInt(0))
    assert(byEpoch.keySet == Set(1, 2, 3))
    // the three epoch-level checksum multisets must differ pairwise
    val sums = byEpoch.view.mapValues(_.map(_.getLong(3)).toSet).toMap
    assert(sums(1) != sums(2) && sums(2) != sums(3) && sums(1) != sums(3),
      "epoch permutations are identical — the epoch salt is not reaching the key")
  }
}
