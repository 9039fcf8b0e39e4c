package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV corpus source — the spreadsheet-era interchange format that
  * still feeds real pipelines (vendor drops, DB exports, labeling
  * vendors all ship .csv), completing the source family q178 opened
  * for JSONL: schema PINNED (inference off — no extra 100 TB pass,
  * no silent upstream re-typing) and PERMISSIVE with corrupt-record
  * quarantine.
  *
  * The quarantine semantics differ from JSONL in an instructive way
  * the census makes visible: a torn JSON line loses EVERY field (the
  * whole object fails to parse), but CSV damage is COLUMNAR — a type
  * drift in one field (here: an upstream writer that started
  * prefixing doc ids) quarantines the row yet the cleanly-parsed
  * sibling fields survive, so the corrupt rows still bucket under
  * their true `source` instead of a lumped `_corrupt` bin, and the
  * forensic raw line rides along in `_corrupt_record`.
  *
  * Scale note: headerless single-line CSV (multiLine=false) is
  * line-splittable, so a 100 TB drop parallelizes by byte range just
  * like JSONL; quoted embedded newlines would force multiLine=true
  * and make each FILE one unsplittable task — the staging contract
  * (no raw EOLs in fields) is itself the scale lever.
  *
  * Reference analogue: `/root/reference/backend/src/db/vector_db.py`
  * ingests whatever the crawler staged; this is the "switch to me"
  * path for the same corpus arriving as CSV.
  */
object Csv {

  /** Every 13th doc ships with a non-numeric doc_id (an upstream
    * export that re-typed the key column) — the planted type drift
    * the pinned schema must quarantine rather than coerce. */
  val CorruptEvery = 13

  private def layoutBase(sfDir: String): String =
    graft.Scratch.dir("csv_layout", sfDir)

  /** Pinned read contract (doc_id, source, text) + quarantine. */
  val ReadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField("_corrupt_record", StringType)))

  /** Stage the documents table as headerless CSV with the planted
    * id-column type drift. The fixture corpus carries no delimiter/
    * quote/EOL bytes in any field (asserted here), so the staged
    * lines are the bare `id,source,text` concatenation — which makes
    * the raw-line length closed-form for the oracle. */
  def stage(spark: SparkSession, sfDir: String): String = {
    val path = s"${layoutBase(sfDir)}/documents_csv"
    val docs = Tables.documents(spark, sfDir)
    val dirty = docs.filter(col("text").rlike("[,\"\n\r]")
      || col("source").rlike("[,\"\n\r]")).limit(1).count()
    require(dirty == 0L,
      "CSV staging contract violated: fields carry delimiter/quote/EOL bytes")
    val id = when(pmod(col("doc_id"), lit(CorruptEvery)) === 0,
      concat(lit("id_"), col("doc_id"))).otherwise(col("doc_id").cast("string"))
    docs.select(concat_ws(",", id, col("source"), col("text")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    path
  }

  /** q183: schema-pinned permissive CSV read with corrupt-row
    * quarantine — per-source line counts, good-row text volume, and
    * the quarantine's columnar-survival property: quarantined rows
    * keep their parsed `source`/`text` fields (counted separately)
    * while the raw line is preserved for forensics.
    *
    * PARSE-SCOPE CAVEAT (and why `n_id_parsed` is in the report): the
    * CSV reader prunes unreferenced columns, and a pruned column is
    * never PARSED — so a query that ignores `doc_id` would see its
    * type drift quarantine NOTHING (the corrupt-record contract is
    * relative to the parsed subset). A quarantine census must
    * therefore reference every contract column; `n_id_parsed` both
    * forces the id parse and publishes its survival count. */
  def corpusHealth(spark: SparkSession, sfDir: String): DataFrame = {
    val path = stage(spark, sfDir)
    val raw = spark.read
      .schema(ReadSchema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
    raw.groupBy(col("source"))
      .agg(count(lit(1)).as("n_lines"),
        count(col("doc_id")).as("n_id_parsed"),
        sum(when(col("_corrupt_record").isNull, 0L).otherwise(1L))
          .as("n_quarantined"),
        coalesce(sum(when(col("_corrupt_record").isNull,
          length(col("text")))), lit(0L)).cast("long").as("good_chars"),
        coalesce(sum(when(col("_corrupt_record").isNotNull,
          length(col("text")))), lit(0L)).cast("long")
          .as("survived_chars"),
        coalesce(sum(length(col("_corrupt_record"))), lit(0L)).cast("long")
          .as("quarantined_chars"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle: the staging rule is closed-form — a planted row's
    * raw line is `id_<doc_id>,<source>,<text>` (its length is
    * arithmetic over the table), its `source`/`text` fields still
    * parse, and only `doc_id` fails the pinned LongType. */
  val corpusHealthSql: String =
    s"""SELECT source,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN doc_id % $CorruptEvery <> 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_id_parsed,
      |  CAST(SUM(CASE WHEN doc_id % $CorruptEvery = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_quarantined,
      |  CAST(COALESCE(SUM(CASE WHEN doc_id % $CorruptEvery <> 0
      |    THEN length(text) END), 0) AS BIGINT) AS good_chars,
      |  CAST(COALESCE(SUM(CASE WHEN doc_id % $CorruptEvery = 0
      |    THEN length(text) END), 0) AS BIGINT) AS survived_chars,
      |  CAST(COALESCE(SUM(CASE WHEN doc_id % $CorruptEvery = 0
      |    THEN length('id_' || doc_id) + 1 + length(source) + 1
      |      + length(text) END), 0) AS BIGINT) AS quarantined_chars
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
