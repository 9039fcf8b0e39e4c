package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE merge-learning invariants (q96). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("replace fuses left-to-right non-overlapping — the semantics the oracle shares") {
    // chain ' a a a ': one fuse per pass, remainder deferred to later
    // rounds (DuckDB's replace() does exactly the same — probed)
    val got = Seq(" a a a ").toDF("s")
      .select(replace($"s", lit(" a a "), lit(" aa ")))
      .as[String].head
    assert(got === " aa a ")
  }

  test("merges are greedy-maximal and compress the corpus monotonically") {
    val rows = Bpe.bpeMerges(spark, sfDir).orderBy($"round").collect()
    assert(rows.length === Bpe.Rounds)
    // greedy: each round's winning count can never exceed the prior
    // round's (a merge only creates pairs rarer than the one it fused)
    rows.map(_.getAs[Long]("pair_count")).sliding(2).foreach {
      case Array(prev, next) => assert(next <= prev)
    }
    // each fuse removes one symbol per fused occurrence: tokens drop,
    // and never by more than the pair's count
    val tok0 = {
      val vocabTokens = Tables.documents(spark, sfDir)
        .select(explode(graft.functions.TextOps.tokens($"text")).as("w"))
        .select(sum(length($"w"))).as[Long].head
      vocabTokens // char-level segmentation: one symbol per char
    }
    var before = tok0
    rows.foreach { r =>
      val after = r.getAs[Long]("corpus_tokens")
      val fused = before - after
      assert(fused > 0, s"round ${r.getAs[Int]("round")} fused nothing")
      assert(fused <= r.getAs[Long]("pair_count"))
      before = after
    }
  }

  test("merge learning is deterministic across runs") {
    val a = Bpe.bpeMerges(spark, sfDir).collect().toSeq
    val b = Bpe.bpeMerges(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
