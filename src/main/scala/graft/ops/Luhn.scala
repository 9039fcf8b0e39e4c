package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checksum-validated PII detection — the precision stage the regex
  * scrubber (q61) doesn't have: a bare `\d{13,19}` detector over web
  * text drowns in false positives (timestamps, ids, phone numbers),
  * so production PII pipelines validate every candidate with the
  * payment-card Luhn checksum (ISO/IEC 7812-1 §B) and only treat
  * checksum-passing runs as card numbers. The whole validator is one
  * single-pass higher-order expression — reversed-digit walk, double
  * every second digit, subtract 9 over 9, sum mod 10 — no UDF, every
  * subtree evaluated once per row, and restated verbatim for the
  * oracle.
  *
  * Scale shape: extraction + validation are per-row scalar work on
  * the text scan (zero shuffles before the final tiny per-status
  * rollup); nothing is data-proportional on the driver. At 100 TB
  * this is exactly the filter you want fused into the ingest scan.
  *
  * The staged text derives deterministically from `orders`: every 5th
  * order carries no digit run (the extractor's null path), the rest
  * embed a 13-19 digit number whose digits come from the order key —
  * so Luhn validity varies naturally with the key and the audit's
  * valid/invalid split is a real measurement, not a planted constant.
  * Variable lengths matter: odd- vs even-length numbers flip which
  * original positions get doubled — the classic Luhn implementation
  * bug the fixture forces both engines to agree on.
  */
object Luhn {

  /** Candidate digit-run pattern (PAN lengths per ISO/IEC 7812). */
  val Pattern = "[0-9]{13,19}"

  /** Luhn checksum over a digit string: walk the REVERSED digits,
    * double every second digit from the right, fold 2d>9 to 2d-9,
    * valid iff the sum ≡ 0 mod 10. Null candidate → null.
    *
    * Expression shape matters: the reversed char array sits in
    * `transform`'s CHILD position (evaluated once per row) and the
    * lambdas touch only their own variables — capturing the candidate
    * producer INSIDE a lambda would re-run it once per digit after
    * projection collapse (the SignPack/TextOps trap; a regex producer
    * would execute ~19× per row). HOFs evaluate outside whole-stage
    * codegen, but single-evaluation keeps the scan linear. */
  def luhnValid(cand: Column): Column = {
    // split(str, "") keeps a trailing "" (Spark splits with limit -1);
    // drop empties so every element is exactly one digit char
    val digits = filter(split(reverse(cand), ""), c => c =!= "")
    val contribs = transform(digits, (c, i0) => {
      val d = c.cast("long")
      // i0 is 0-based from the right: double the odd indices
      // (positions 2, 4, … from the right)
      when(pmod(i0, lit(2)) === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    val s = aggregate(contribs, lit(0L), (acc, x) => acc + x)
    pmod(s, lit(10)) === 0
  }

  /** The staged text column: 4 of 5 orders embed a key-derived
    * 13-19 digit run, every 5th has none. */
  private def staged(spark: SparkSession, sfDir: String): DataFrame = {
    val key = col("o_orderkey")
    val base = lpad(key.cast("string"), 10, "0")
    val pool = concat(base, reverse(base), base)
    val num = pool.substr(lit(1), (lit(13) + pmod(key, lit(7))).cast("int"))
    Tables.orders(spark, sfDir).select(
      col("o_orderstatus").as("status"),
      when(pmod(key, lit(5)) === 0,
        lit("order paid by invoice, no card on file"))
        .otherwise(concat(lit("order charged to card "), num,
          lit(" on file"))).as("text"))
  }

  /** q203: per-status PAN audit — extract the first 13-19 digit run
    * from each order's text, Luhn-validate it, report candidate /
    * valid / invalid counts per order status. */
  def luhnAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val cand = nullif(regexp_extract(col("text"), Pattern, 0), lit(""))
    staged(spark, sfDir)
      .withColumn("cand", cand)
      .withColumn("valid", luhnValid(col("cand")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("cand")).as("n_cands"),
        count(when(col("valid"), lit(1))).as("n_valid"),
        count(when(col("cand").isNotNull && !col("valid"), lit(1)))
          .as("n_invalid"))
      .orderBy(col("status"))
  }

  /** DuckDB oracle: identical staging, extraction, and checksum. */
  val luhnAuditSql: String =
    s"""WITH staged AS (
      |  SELECT o_orderstatus AS status,
      |    CASE WHEN o_orderkey % 5 = 0
      |      THEN 'order paid by invoice, no card on file'
      |      ELSE 'order charged to card ' ||
      |        substr(lpad(CAST(o_orderkey AS VARCHAR), 10, '0') ||
      |               reverse(lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) ||
      |               lpad(CAST(o_orderkey AS VARCHAR), 10, '0'),
      |          1, CAST(13 + o_orderkey % 7 AS INT)) || ' on file'
      |    END AS text
      |  FROM orders),
      |cands AS (
      |  SELECT status,
      |    CASE WHEN regexp_matches(text, '$Pattern')
      |         THEN regexp_extract(text, '$Pattern') END AS cand
      |  FROM staged),
      |luhn AS (
      |  SELECT status, cand,
      |    CASE WHEN cand IS NULL THEN NULL ELSE
      |      list_sum(list_transform(range(1, length(cand) + 1), i ->
      |        CASE WHEN i % 2 = 0 THEN
      |          CASE WHEN 2 * CAST(substr(reverse(cand), i, 1) AS BIGINT) > 9
      |               THEN 2 * CAST(substr(reverse(cand), i, 1) AS BIGINT) - 9
      |               ELSE 2 * CAST(substr(reverse(cand), i, 1) AS BIGINT) END
      |        ELSE CAST(substr(reverse(cand), i, 1) AS BIGINT) END)) % 10 = 0
      |    END AS valid
      |  FROM cands)
      |SELECT status, count(*) AS n_orders, count(cand) AS n_cands,
      |  count(*) FILTER (WHERE valid) AS n_valid,
      |  count(*) FILTER (WHERE cand IS NOT NULL AND NOT valid) AS n_invalid
      |FROM luhn GROUP BY status ORDER BY status""".stripMargin
}
