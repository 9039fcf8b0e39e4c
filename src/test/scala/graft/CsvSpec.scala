package graft

import graft.ops.Csv
import org.apache.spark.sql.functions._

/** CSV source (q183): the columnar-survival quarantine contract (a
  * type drift in one field quarantines the row but keeps the cleanly
  * parsed siblings), and the parse-scope caveat the census is built
  * around — a query that never references the drifted column sees no
  * corruption at all under column pruning.
  */
class CsvSpec extends SparkSpec {
  import spark.implicits._

  private def readStaged() = {
    val path = Csv.stage(spark, sfDir)
    spark.read.schema(Csv.ReadSchema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }

  test("type drift quarantines the row but parsed siblings survive") {
    val raw = readStaged().cache()
    try {
      val bad = raw.filter($"_corrupt_record".isNotNull)
      assert(bad.count() > 0)
      bad.collect().foreach { r =>
        assert(r.isNullAt(r.fieldIndex("doc_id")),
          "the drifted field must be null, not coerced")
        assert(r.getAs[String]("source") != null
          && r.getAs[String]("text") != null,
          "CSV damage is columnar: clean fields must survive")
        val line = r.getAs[String]("_corrupt_record")
        assert(line.startsWith("id_") && line.contains(","),
          "the raw line must ride along for forensics")
      }
    } finally raw.unpersist()
  }

  test("parse scope decides corruption: pruning the id column hides the drift") {
    val raw = readStaged()
    // referencing only (source, _corrupt_record) prunes doc_id — the
    // drifted field is never parsed, so NOTHING is quarantined; this
    // is the trap corpusHealth's n_id_parsed column exists to close.
    // (Both aggregates keep a data column referenced alongside the
    // corrupt column — a corrupt-column-only query is disallowed.)
    val pruned = raw.agg(
      count($"source").as("n"), count($"_corrupt_record").as("q"))
      .collect().head
    assert(pruned.getLong(1) == 0L,
      s"pruned parse must see no corruption, got ${pruned.getLong(1)} rows")
    val full = raw.agg(
      count($"source").as("n"), count($"doc_id").as("ids"),
      count($"_corrupt_record").as("q")).collect().head
    assert(full.getLong(2) > 0L,
      "full parse must quarantine the planted drift")
  }

  test("census matches a driver replay of the staging rule") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val expected = docs.groupBy(_._2).map { case (src, rows) =>
      val bad = rows.filter(_._1 % Csv.CorruptEvery == 0)
      val good = rows.filter(_._1 % Csv.CorruptEvery != 0)
      (src, rows.length.toLong, good.length.toLong, bad.length.toLong,
        good.map(_._3.length.toLong).sum, bad.map(_._3.length.toLong).sum,
        bad.map(r => s"id_${r._1},${r._2},${r._3}".length.toLong).sum)
    }.toSet
    val got = Csv.corpusHealth(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }.toSet
    assert(got == expected)
  }
}
