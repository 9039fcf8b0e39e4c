package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev staging for the empirical scale probe (VERDICT r9 #3): build a
  * K× corpus from an existing testdata dir with NO driver involvement,
  * shaped so every copy is an INDEPENDENT clone of the base workload —
  * the honest linear-scaling reference:
  *
  *   documents — copy k re-keys `doc_id + k·stride` (stride = max+1;
  *     the planted-id base is SF-PROPORTIONAL since r12 —
  *     [[graft.ops.Planted.baseFor]] derives it from the staged max
  *     id, so any K stays inside the guard: 30× sf0.1 tops out at
  *     149,999 and transparently gets base 10⁷) and suffixes EVERY token
  *     with `_zk<k>`. Token/shingle/char-window vocabularies are
  *     therefore disjoint across copies: no cross-copy exact, Jaccard,
  *     MinHash, containment, or substring pairs form, so pair volume
  *     scales K× (10 independent corpora), not C(K,2)-quadratically
  *     the way verbatim duplication would — which would measure the
  *     WORKLOAD blowing up, not the engine.
  *   embeddings — copy k re-keys `vec_id + k·stride` and ROTATES the
  *     vector by k components (a permutation: within-copy geometry is
  *     exactly the base corpus's; cross-copy cosines are hash-noise).
  *   every other table — byte-copied as-is (the probed families are
  *     the documents/embeddings-centric ones).
  *
  * {{{ sbt "runMain graft.tools.StageScaledCorpus /root/testdata/sf0.1 /dev/shm/graft_scale/x10 10" }}}
  */
object StageScaledCorpus {

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val out = args(1)
    val k = args(2).toInt
    require(k >= 1)
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    new java.io.File(out).mkdirs()

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val dStride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val dCopies = (0 until k).map { i =>
      if (i == 0) docs
      else {
        val rewritten = concat_ws(" ",
          transform(split(col("text"), " "), t => concat(t, lit(s"_zk$i"))))
        docs.select((col("doc_id") + i * dStride).as("doc_id"),
          rewritten.as("text"), col("lang"), col("source"),
          length(rewritten).cast("long").as("n_chars"))
      }
    }
    dCopies.reduce(_ unionByName _)
      .repartition(8).write.parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val eStride = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    val eCopies = (0 until k).map { i =>
      if (i == 0) emb
      else emb.select((col("vec_id") + i * eStride).as("vec_id"),
        transform(sequence(lit(0), size(col("embedding")) - 1),
          j => element_at(col("embedding"),
            pmod(j + lit(i), size(col("embedding"))) + 1)).as("embedding"),
        col("label"))
    }
    eCopies.reduce(_ unionByName _)
      .repartition(4).write.parquet(s"$out/embeddings.parquet")

    // part scales by re-key alone: the image/video fixtures derive
    // their content from p_partkey (md5-based rasters), so re-keyed
    // copies are automatically DISTINCT assets — the q167/q175
    // families scale as independent clones with no perturbation
    val part = spark.read.parquet(s"$base/part.parquet")
    val pStride = part.agg(max(col("p_partkey"))).head.getLong(0) + 1
    (0 until k).map { i =>
      if (i == 0) part
      else part.withColumn("p_partkey", col("p_partkey") + i * pStride)
    }.reduce(_ unionByName _)
      .repartition(4).write.parquet(s"$out/part.parquet")

    for (t <- graft.Tables.names
         if t != "documents" && t != "embeddings" && t != "part")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$base/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)

    val n = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"STAGED $out k=$k documents=$n embeddings=$ne " +
      s"docStride=$dStride embStride=$eStride")
    spark.stop()
  }
}
