package graft

import graft.ops.Compaction
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Small-file compaction (q172): the bin-packing contract (file
  * count from Σbytes/target, size band), content preservation
  * row-for-row, and idempotence (compacting a compacted layout is a
  * no-op in file count).
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private val base = new java.io.File(
    sys.props("java.io.tmpdir"), "graft_compaction_spec").getAbsolutePath

  test("compact packs to ceil(total/target) near-uniform files") {
    val frag = s"$base/frag"
    val out = s"$base/out"
    Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_partkey")
      .repartition(32).write.mode(SaveMode.Overwrite).parquet(frag)
    val target = 64L * 1024
    val (before, after, total) = Compaction.compact(spark, frag, out, target)
    assert(before == 32)
    assert(after == math.max(1L, (total + target - 1) / target).toInt)
    assert(after < before)
  }

  test("compaction preserves content row-for-row") {
    val frag = s"$base/frag2"
    val out = s"$base/out2"
    Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .repartition(32).write.mode(SaveMode.Overwrite).parquet(frag)
    Compaction.compact(spark, frag, out, 64L * 1024)
    def sorted(path: String) = spark.read.parquet(path)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(sorted(frag) === sorted(out))
  }

  test("compacting a compacted layout is a file-count no-op") {
    val frag = s"$base/frag3"
    val out1 = s"$base/out3a"
    val out2 = s"$base/out3b"
    Tables.lineitem(spark, sfDir).select($"l_orderkey", $"l_quantity")
      .repartition(32).write.mode(SaveMode.Overwrite).parquet(frag)
    val target = 64L * 1024
    val (_, after1, _) = Compaction.compact(spark, frag, out1, target)
    val (_, after2, _) = Compaction.compact(spark, out1, out2, target)
    // re-encoding can shift total bytes across a target boundary by
    // at most one file; the second pass must not re-fragment
    assert(math.abs(after2 - after1) <= 1)
  }
}
