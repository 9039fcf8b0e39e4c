package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q226: Bloom-filter n-gram decontamination — the FIXED-MEMORY scale
  * path for "drop training documents that contain benchmark n-grams"
  * (Brown et al. 2020 §C filter eval overlap with 13-gram Blooms;
  * Bloom 1970). q63 already scores contamination by the EXACT
  * inverted-index join; that join's state is proportional to the eval
  * set's gram count and must shuffle the corpus against it. The Bloom
  * route compresses the whole eval gram set into a constant-size
  * bitmap ([[Words]]×[[WordBits]] = 61,440 positions ≈ 8 KB) that
  * broadcasts for free at any corpus size — the trade is a measurable
  * false-positive rate (docs dropped that share no gram), and ZERO
  * false negatives (nothing contaminated survives).
  *
  * This query is the CALIBRATION census for that trade: it runs BOTH
  * routes and reports, per source, document- and gram-level flag
  * counts, the exact-truth counts, the false positives, and the
  * false-negative count — which the Bloom contract fixes at 0, so the
  * column is an oracle-checked invariant, not a measurement. A
  * production 100 TB run keeps only the Bloom side (scan + 1024-row
  * broadcast, no corpus-vs-eval shuffle); the exact side exists here
  * to put the FP rate under the gate.
  *
  * Cross-engine determinism: the filter is NOT Spark's built-in
  * `bloom_filter_agg` (its hashing is engine-private); positions are
  * the engine's md5 rule — `hash60("bf<i>_" + gram) % M`, i <
  * [[K]] — and the bitmap is a (word, bits) relation with
  * [[WordBits]] = 60 bits per word so every shift stays in positive
  * BIGINT range on both engines. DuckDB derives the identical bitmap
  * from the identical rule, so the census hashes exactly.
  */
object Decontaminate {

  /** Hash functions per gram. */
  val K = 4
  /** Bits per bitmap word — ≤ 62 so `1L << bit` never wraps sign. */
  val WordBits = 60
  /** Bitmap words; the whole filter is ≤ this many broadcast rows. */
  val Words = 1024
  /** Bitmap positions. */
  val M: Long = Words.toLong * WordBits
  /** Held-out "benchmark" carve: every 97th organic document. */
  val EvalEvery = 97

  /** The K bitmap positions of a gram string, as an array column. */
  private def positions(gram: Column): Column =
    transform(sequence(lit(0), lit(K - 1)), i =>
      pmod(TextOps.hash60(
        concat(lit("bf"), i.cast("string"), lit("_"), gram)), lit(M)))

  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        TextOps.tokens(col("text")).as("toks"))
    // distinct grams per document (gram STRINGS — positions derive
    // from text, not from a pre-hashed id)
    val grams = d.select(col("doc_id"), col("source"),
      explode(array_distinct(TextOps.shinglesFromTokens(col("toks"))))
        .as("gram"))
    val isEval = pmod(col("doc_id"), lit(EvalEvery)) === 0
    val evalGrams = grams.filter(isEval).select(col("gram")).distinct()
    val train = grams.filter(!isEval)
    // ---- build: eval grams → K positions → (word, bits) bitmap.
    // ≤ Words rows regardless of eval-set size — the bounded
    // broadcast class (q88 rule: bounded by construction, not by
    // current stats)
    val bf = evalGrams
      .select(explode(positions(col("gram"))).as("pos")).distinct()
      .select((col("pos") / WordBits).cast("long").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(pos % $WordBits as int))")
          .as("bit"))
      .groupBy(col("word")).agg(expr("bit_or(bit)").as("bits"))
    // ---- probe: every train gram's K positions against the bitmap.
    // One broadcast-joined scan; a position whose word is absent from
    // the bitmap is a miss (left join, null bits → 0)
    val probed = train
      .select(col("doc_id"), col("source"), col("gram"),
        explode(positions(col("gram"))).as("pos"))
      .select(col("doc_id"), col("source"), col("gram"),
        (col("pos") / WordBits).cast("long").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(pos % $WordBits as int))")
          .as("bit"))
      .join(broadcast(bf), Seq("word"), "left")
      .groupBy(col("doc_id"), col("source"), col("gram"))
      .agg((sum(when(coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("bit")) =!= 0L, 1L).otherwise(0L)) === K)
        .as("flagged"))
    // ---- exact ground truth (the route the Bloom REPLACES at scale;
    // kept here to measure the FP rate): corpus-vs-eval equi join on
    // the gram — partitioned, never broadcast (eval grams grow with
    // the benchmark suite)
    val truth = probed.join(
      evalGrams.withColumn("is_true", lit(true)), Seq("gram"), "left")
      .na.fill(false, Seq("is_true"))
    val b2l = (c: Column) => when(c, 1L).otherwise(0L)
    val gramStats = truth.groupBy(col("source")).agg(
      count(lit(1)).as("n_grams"),
      sum(b2l(col("flagged"))).as("n_flagged_grams"),
      sum(b2l(col("is_true"))).as("n_true_grams"),
      sum(b2l(col("flagged") && !col("is_true"))).as("n_fp_grams"),
      // the Bloom contract: nothing truly contaminated escapes —
      // oracle-checked invariant, always 0
      sum(b2l(col("is_true") && !col("flagged"))).as("n_fn_grams"))
    val docStats = truth.groupBy(col("doc_id"), col("source")).agg(
        max(col("flagged")).as("doc_flagged"),
        max(col("is_true")).as("doc_true"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(b2l(col("doc_flagged"))).as("n_flagged_docs"),
        sum(b2l(col("doc_true"))).as("n_true_docs"))
    docStats.join(gramStats, Seq("source")).orderBy(col("source"))
  }

  val decontaminateSql: String = {
    val tok = TextOps.tokSql()
    // COALESCE: a zero-token document shingles to the '' gram in
    // Spark (concat_ws) but array_to_string([]) is NULL in DuckDB and
    // list_distinct would drop it — the q81 empty-list parity class,
    // hardened here the same way (cannot fire under the ≥10-token
    // corpus contract; scale-proofing only)
    val shingles =
      s"""CASE WHEN len(toks) < 3 THEN [COALESCE(array_to_string(toks, ' '), '')]
         |     ELSE list_transform(generate_series(1, len(toks) - 2),
         |            i -> array_to_string(toks[i:i+2], ' ')) END""".stripMargin
    def posOf(gram: String, i: String) =
      s"('0x' || substr(md5('bf' || $i || '_' || $gram), 1, 15))::BIGINT % $M"
    s"""WITH d AS (SELECT doc_id, source, $tok AS toks FROM documents),
      |g AS (
      |  SELECT doc_id, source, unnest(list_distinct($shingles)) AS gram
      |  FROM d),
      |eval_grams AS (
      |  SELECT DISTINCT gram FROM g WHERE doc_id % $EvalEvery = 0),
      |bf AS (
      |  SELECT pos // $WordBits AS word,
      |    bit_or(1::BIGINT << CAST(pos % $WordBits AS INT)) AS bits
      |  FROM (
      |    SELECT DISTINCT ${posOf("gram", "i")} AS pos
      |    FROM eval_grams CROSS JOIN generate_series(0, ${K - 1}) AS t(i))
      |  GROUP BY pos // $WordBits),
      |probed AS (
      |  SELECT doc_id, source, gram,
      |    SUM(CASE WHEN COALESCE(bf.bits, 0) & (1::BIGINT << CAST(p.pos % $WordBits AS INT)) <> 0
      |             THEN 1 ELSE 0 END) = $K AS flagged
      |  FROM (
      |    SELECT doc_id, source, gram, ${posOf("gram", "i")} AS pos
      |    FROM g CROSS JOIN generate_series(0, ${K - 1}) AS t(i)
      |    WHERE doc_id % $EvalEvery <> 0) p
      |  LEFT JOIN bf ON bf.word = p.pos // $WordBits
      |  GROUP BY doc_id, source, gram),
      |truth AS (
      |  SELECT p.doc_id, p.source, p.flagged,
      |    e.gram IS NOT NULL AS is_true
      |  FROM probed p LEFT JOIN eval_grams e ON e.gram = p.gram),
      |gs AS (
      |  SELECT source, COUNT(*) AS n_grams,
      |    CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_grams,
      |    CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_grams,
      |    CAST(SUM(CASE WHEN flagged AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_fp_grams,
      |    CAST(SUM(CASE WHEN is_true AND NOT flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_fn_grams
      |  FROM truth GROUP BY source),
      |ds AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(CASE WHEN doc_flagged THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_docs,
      |    CAST(SUM(CASE WHEN doc_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_docs
      |  FROM (
      |    SELECT doc_id, source, MAX(flagged) AS doc_flagged,
      |      MAX(is_true) AS doc_true
      |    FROM truth GROUP BY doc_id, source)
      |  GROUP BY source)
      |SELECT ds.source, n_docs, n_flagged_docs, n_true_docs, n_grams,
      |  n_flagged_grams, n_true_grams, n_fp_grams, n_fn_grams
      |FROM ds JOIN gs ON ds.source = gs.source
      |ORDER BY ds.source""".stripMargin
  }
}
