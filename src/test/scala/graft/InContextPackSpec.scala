package graft

import graft.ops.InContextPack
import graft.functions.TextOps
import org.apache.spark.sql.functions._

/** q229 in-context packing: the packing must cover the corpus exactly
  * (every document in exactly one context, token mass preserved), the
  * semantic ordering must actually RAISE the adjacent-pair cosine
  * against doc_id-order packing (the quantity in-context pretraining
  * exists to raise), and the corpus-proportional joins must keep
  * their hinted partitioned shapes (checkpoint-fed lineage — the
  * q224 trap class). */
class InContextPackSpec extends SparkSpec {

  private lazy val rows =
    InContextPack.inContextPack(spark, sfDir).collect()

  test("coverage: every document lands in exactly one context") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val totTok = Tables.documents(spark, sfDir)
      .agg(sum(TextOps.tokenCountBpe(col("text")))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totTok)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("n_tokens") >= 1L)
    }
  }

  test("semantic ordering raises adjacent cosine vs doc_id order") {
    import spark.implicits._
    // pair-weighted mean over the query's contexts (n_docs-1
    // adjacent pairs per context; single-doc contexts carry none)
    val num = rows.collect {
      case r if !r.isNullAt(r.fieldIndex("mean_adj_sim")) =>
        (r.getAs[Long]("n_docs") - 1) * r.getAs[Double]("mean_adj_sim")
    }.sum
    val den = rows.map(_.getAs[Long]("n_docs") - 1).sum
    val semantic = num / den
    // baseline: the SAME cumsum-floor packing over doc_id order with
    // no clustering — replayed in the driver
    val docs = Corpus.docEmbeddings(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(
        col("doc_id").as("vec_id"),
        TextOps.tokenCountBpe(col("text")).as("n_tok")), Seq("vec_id"))
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("v"), col("n_tok"))
      .as[(Long, Seq[Double], Long)].collect()
    var cum = 0L
    val ctxOf = docs.map { case (_, _, n) =>
      val c = cum / InContextPack.CtxBudget; cum += n; c
    }
    val sims = docs.indices.dropRight(1).collect {
      case i if ctxOf(i) == ctxOf(i + 1) =>
        val (va, vb) = (docs(i)._2, docs(i + 1)._2)
        val dot = va.zip(vb).map { case (x, y) => x * y }.sum
        val na = math.sqrt(va.map(x => x * x).sum)
        val nb = math.sqrt(vb.map(x => x * x).sum)
        if (na * nb == 0.0) 0.0 else dot / (na * nb)
    }
    val baseline = sims.sum / sims.length
    assert(semantic > baseline,
      f"semantic $semantic%.4f did not beat doc_id-order $baseline%.4f")
  }

  test("plan: the packed stage's ntok join stays shuffle-hashed") {
    // the stage is checkpointed inside inContextPack, which hides
    // this join from the final plan — pin it on the stage itself:
    // exactly ONE BroadcastHashJoin (the bounded K-centroid distance
    // join; the assignment's crossJoin broadcasts as a nested-loop,
    // not a hash join), and the corpus-proportional ntok join
    // shuffle-hashed (dropping its hint would surface as a second
    // broadcast hash join or as a sort-merge — either fails here)
    val p = InContextPack.packedStage(spark, sfDir)
      .queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj == 1, s"expected exactly the 1 bounded model " +
      s"broadcast-hash join, found $bhj:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"the ntok join lost its shuffle_hash shape (q224 trap):\n$p")
  }

  test("plan: hinted partitioned joins hold (q224 convention)") {
    // the packed stage is localCheckpoint-materialized (it feeds both
    // adjacency sides and the rollup), so its hinted ntok join lives
    // inside the checkpoint evaluation; the FINAL plan must show the
    // adjacency join shuffle-hashed, the rollup merged, and no
    // broadcast of the corpus-proportional checkpoint relations
    val p = InContextPack.inContextPack(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      s"the adjacency join lost its shuffle_hash shape:\n$p")
    assert(p.contains("SortMergeJoin"),
      s"the per-context rollup lost its merge shape:\n$p")
    assert(!p.contains("BroadcastExchange"),
      s"a corpus-proportional side got broadcast (q224 trap):\n$p")
  }
}
