package graft

import graft.ops.Jsonl
import org.apache.spark.sql.functions._

/** JSONL source (q178): quarantine forensics (the raw torn line
  * survives in `_corrupt_record`), and the pinned schema treating
  * type drift as corruption rather than silently re-typing.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("quarantined rows carry the raw torn line") {
    val path = Jsonl.stage(spark, sfDir)
    // corrupt-column-only queries over raw files are disallowed
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parsed result
    // first, per the documented contract
    val raw = spark.read.schema(Jsonl.ReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    try {
    val bad = raw.filter($"_corrupt_record".isNotNull)
    assert(bad.count() > 0)
    bad.collect().foreach { r =>
      val line = r.getAs[String]("_corrupt_record")
      assert(line.length == 20 && line.startsWith("{\"doc_id\""))
      assert(r.isNullAt(r.fieldIndex("source")), "torn line must not parse")
    }
    } finally raw.unpersist()
  }

  test("type drift quarantines instead of silently re-typing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_drift")
    val f = dir.resolve("part.jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "source": "a", "text": "ok"}""",
      """{"doc_id": "NOT_A_NUMBER", "source": "b", "text": "drifted"}"""))
    val raw = spark.read.schema(Jsonl.ReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString)
    val rows = raw.orderBy($"doc_id".asc_nulls_last).collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(3))
    assert(rows(1).isNullAt(0) && !rows(1).isNullAt(3),
      "the drifted line must land in quarantine, not coerce")
  }
}
