package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) corpus source — THE interchange
  * format of LLM training corpora (every public text dump ships as
  * .jsonl.{gz,zst}), and a source family member the engine lacked:
  * q37 decodes a JSON string COLUMN, this reads JSON FILES, with the
  * two production disciplines that distinguish a pipeline from a
  * notebook:
  *
  *   - SCHEMA PINNED, inference off. Schema inference runs a whole
  *     extra pass over 100 TB before the real one, and worse, lets
  *     upstream drift silently re-type a column; production reads
  *     declare the contract and let violations surface as corrupt
  *     rows.
  *   - PERMISSIVE + corrupt-record capture. Real dumps carry
  *     truncated lines (killed writers), and failing the whole job on
  *     line 3 billion is not an option — bad lines land in a
  *     quarantine column (`_corrupt_record`), get COUNTED, and the
  *     good rows flow on. The corrupt share is itself a data-quality
  *     signal the census publishes.
  *
  * Scale note: JSONL (multiLine=false) is line-splittable, so a
  * 100 TB dump parallelizes by byte range; a single multi-line JSON
  * document is one unsplittable task — the format choice IS the
  * scale lever.
  */
object Jsonl {

  /** Every 13th doc ships as a truncated line (a killed writer's
    * torn tail) — the planted corruption the quarantine must catch. */
  val CorruptEvery = 13

  private def layoutBase(sfDir: String): String =
    graft.Scratch.dir("jsonl_layout", sfDir)

  /** Pinned read contract (doc_id, source, text) + quarantine. */
  val ReadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField("_corrupt_record", StringType)))

  /** Stage the documents table as JSONL with planted torn lines. */
  def stage(spark: SparkSession, sfDir: String): String = {
    val path = s"${layoutBase(sfDir)}/documents_jsonl"
    val line = to_json(struct(col("doc_id"), col("source"), col("text")))
    Tables.documents(spark, sfDir)
      .select(when(pmod(col("doc_id"), lit(CorruptEvery)) === 0,
        substring(line, 1, 20)).otherwise(line).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    path
  }

  /** q178: schema-pinned permissive JSONL read with corrupt-line
    * quarantine — per-source line counts and good-text volume, plus
    * the `_corrupt` bucket. The read HARD-ASSERTS inference stayed
    * off by construction (explicit schema) and that quarantined rows
    * carry the raw line for forensics. */
  def corpusHealth(spark: SparkSession, sfDir: String): DataFrame = {
    val path = stage(spark, sfDir)
    val raw = spark.read
      .schema(ReadSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    raw.groupBy(coalesce(col("source"), lit("_corrupt")).as("source"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_corrupt_record").isNull, 0L).otherwise(1L))
          .as("n_quarantined"),
        coalesce(sum(length(col("text"))), lit(0L)).cast("long")
          .as("good_chars"),
        coalesce(sum(when(col("_corrupt_record").isNotNull,
          length(col("_corrupt_record")))), lit(0L)).cast("long")
          .as("quarantined_chars"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle: the staging rule is closed-form, so the oracle
    * recomputes the census from the TABLE — a torn line parses to
    * nothing (source NULL ⇒ `_corrupt` bucket) and carries its 20
    * raw chars into the quarantine column. */
  val corpusHealthSql: String =
    s"""SELECT
      |  CASE WHEN doc_id % $CorruptEvery = 0 THEN '_corrupt'
      |       ELSE source END AS source,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CASE WHEN doc_id % $CorruptEvery = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_quarantined,
      |  CAST(COALESCE(SUM(CASE WHEN doc_id % $CorruptEvery <> 0
      |    THEN length(text) END), 0) AS BIGINT) AS good_chars,
      |  CAST(SUM(CASE WHEN doc_id % $CorruptEvery = 0 THEN 20 ELSE 0 END)
      |    AS BIGINT) AS quarantined_chars
      |FROM documents
      |GROUP BY 1
      |ORDER BY source""".stripMargin
}
