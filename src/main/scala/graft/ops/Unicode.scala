package graft.ops

import graft.Tables
import graft.expressions.NfcNormalize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unicode-canonicalization dedup census — the byte-level blind spot
  * of the exact-dedup family (q21/q22 fingerprint RAW text): "café"
  * with precomposed U+00E9 and "cafe" + combining U+0301 are
  * canonically EQUIVALENT (UAX #15) but hash apart, so a re-crawled
  * page whose editor re-serialized to NFD survives fingerprint dedup
  * as a full duplicate. Production corpus hygiene normalizes to NFC
  * before fingerprinting; this census measures exactly what that buys
  * — per source, how many exact-byte groups collapse once text is NFC
  * normalized ([[graft.expressions.NfcNormalize]], a codegen'd native
  * expression, also SQL-registered as `nfc_normalize`).
  *
  * Staging (key-derived, restated in the oracle): every document
  * carries an NFC suffix " café"; each doc_id ≡ 0 (mod 3) also plants
  * a slot-7 twin with the DECOMPOSED suffix (same text under NFC —
  * must collapse), and each doc_id ≡ 1 (mod 3) a slot-8 twin with a
  * genuinely different unaccented suffix (must NOT collapse — the
  * over-merge control).
  *
  * Scale shape: normalization is per-row scalar work fused into the
  * scan (the `isNormalized` fast path makes ASCII-clean text nearly
  * free), and the census is count-distincts over 128-bit
  * fingerprints — the same single-exchange shape as q22. At 100 TB
  * the NFC step rides the existing fingerprint pass for free.
  */
object Unicode {

  /** Precomposed suffix (U+00E9). */
  private val NfcSuffix = " caf\u00e9"
  /** Canonically-equivalent decomposed suffix (e + U+0301). */
  private val NfdSuffix = " cafe\u0301"
  /** Genuinely different suffix — the over-merge control. */
  private val PlainSuffix = " cafe"

  /** q209: per-source exact-vs-NFC fingerprint group census. */
  def nfcDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val off7 = Planted.familyOffset(spark, sfDir, 7, "q209 nfc twins")
    val off8 = Planted.familyOffset(spark, sfDir, 8, "q209 nfc control")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val a = docs.select(col("doc_id"), col("source"),
      concat(col("text"), lit(NfcSuffix)).as("text"))
    val b = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select((col("doc_id") + off7).as("doc_id"), col("source"),
        concat(col("text"), lit(NfdSuffix)).as("text"))
    val c = docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select((col("doc_id") + off8).as("doc_id"), col("source"),
        concat(col("text"), lit(PlainSuffix)).as("text"))
    a.unionByName(b).unionByName(c)
      .select(col("source"),
        md5(col("text").cast("binary")).as("exact_fp"),
        md5(NfcNormalize.nfc(col("text")).cast("binary")).as("nfc_fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("exact_fp")).as("exact_groups"),
        countDistinct(col("nfc_fp")).as("nfc_groups"))
      .withColumn("collapsed", col("exact_groups") - col("nfc_groups"))
      .orderBy(col("source"))
  }

  val nfcDedupSql: String =
    s"""WITH staged AS (
      |  SELECT doc_id, source, text || ' caf' || chr(233) AS text
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id + ${Planted.offsetSql(7)}, source, text || ' cafe' || chr(769)
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + ${Planted.offsetSql(8)}, source, text || ' cafe'
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT source, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT md5(text)) AS exact_groups,
      |  COUNT(DISTINCT md5(nfc_normalize(text))) AS nfc_groups,
      |  COUNT(DISTINCT md5(text))
      |    - COUNT(DISTINCT md5(nfc_normalize(text))) AS collapsed
      |FROM staged GROUP BY source ORDER BY source""".stripMargin
}
