package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline: span-level
  * repeated-n-gram removal (the cross-document half of dedup that
  * document-level MinHash misses), a linear quality classifier, and
  * token-budget sequence packing.
  *
  * Scale shapes: span removal shuffles only (gram_hash, doc_id) pairs
  * and per-doc covered-start arrays — never token payloads; the
  * classifier is a single codegen'd scan + one partial agg; packing
  * windows are partitioned by shard (source), never global.
  */
object Curation {

  private val tokSql = TextOps.tokSql()

  // ---- 1. repeated-span removal (q81) --------------------------

  /** Spans (trigrams) that occur in ≥ [[SpanDocThreshold]] distinct
    * documents are boilerplate; every token covered by such a span is
    * removed from every document (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better" — the span-level counterpart
    * of document dedup). Threshold is absolute, like the paper's
    * repetition count, not corpus-relative.
    *
    * Shape: gram occurrences carry (doc_id, start, hash60) — 8-byte
    * keys, not text — through the frequency shuffle (the same shape
    * as the q63 contamination join, partial-aggregated map-side);
    * the removal happens inside the document row via an index-aware
    * `filter` HOF against the per-doc covered-start array. The token
    * arrays cross exactly ONE shuffle: the final doc ⋈ covered-starts
    * join (both relations derive from the same scan, so a corpus
    * bucketed by doc_id makes even that join co-located; the
    * candidate alternative — shuffling every (doc, pos, token) row —
    * would move the token stream three times).
    */
  val SpanN = 3
  val SpanDocThreshold = 5

  def spanDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    val grams = d.filter(col("n") >= SpanN)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n") - (SpanN - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        TextOps.hash60(concat_ws(" ", slice(col("toks"), col("i"), lit(SpanN))))
          .as("gh"))
    val freq = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= SpanDocThreshold)
      .select(col("gh"))
    val covered = grams.join(freq, Seq("gh"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("i")).as("starts"))
    d.join(covered, Seq("doc_id"), "left")
      .withColumn("starts",
        coalesce(col("starts"), array().cast("array<int>")))
      .withColumn("kept", filter(col("toks"), (t, idx) =>
        !exists(col("starts"), s =>
          idx + 1 >= s && idx + 1 <= s + (SpanN - 1))))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        (col("n") - size(col("kept"))).cast("long").as("n_removed"),
        TextOps.hash60(concat_ws(" ", col("kept"))).as("kept_hash"))
      .orderBy(col("doc_id"))
  }

  val spanDedupSql: String = {
    val w = SpanN - 1
    s"""WITH d AS (
      |  SELECT doc_id, $tokSql AS toks, len($tokSql) AS n FROM documents),
      |g AS (
      |  SELECT doc_id, i,
      |    ('0x' || substr(md5(array_to_string(toks[i:i+$w], ' ')), 1, 15))::BIGINT AS gh
      |  FROM d CROSS JOIN LATERAL unnest(generate_series(1, n - $w)) AS t(i)
      |  WHERE n >= $SpanN),
      |freq AS (
      |  SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gh)
      |  WHERE df >= $SpanDocThreshold),
      |cov AS (
      |  SELECT doc_id, list(i) AS starts FROM g JOIN freq USING (gh) GROUP BY doc_id),
      |r AS (
      |  SELECT d.doc_id, d.n,
      |    list_filter(d.toks, (x, p) ->
      |      len(list_filter(COALESCE(c.starts, CAST([] AS BIGINT[])),
      |                      s -> p >= s AND p <= s + $w)) = 0) AS kept
      |  FROM d LEFT JOIN cov c USING (doc_id))
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      |  CAST(n - len(kept) AS BIGINT) AS n_removed,
      |  ('0x' || substr(md5(array_to_string(kept, ' ')), 1, 15))::BIGINT AS kept_hash
      |FROM r ORDER BY doc_id""".stripMargin
  }

  // ---- 2. linear quality classifier (q84) ----------------------

  /** Deterministic stand-in for a fastText/logistic quality model
    * (the C4/CCNet filtering stage): five hand features → fixed
    * linear weights → sigmoid → keep/drop at 0.5. The weights are
    * literals in BOTH engines; z is rounded to 9 decimals before the
    * sigmoid and the score to 6 after, so the one transcendental
    * (exp) cannot drift across libm implementations.
    *
    * Single codegen'd scan + one partial agg by source — the shape
    * that saturates scan bandwidth at 100 TB.
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-doc scores over any (doc_id, source, text) relation —
    * exposed so specs can probe the model on synthetic documents. */
  def scoreDocs(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
    val sw = array(Stopwords.map(lit): _*)
    val feats = d.select(col("doc_id"), col("source"),
      round(log(lit(1.0) + col("n")), 9).as("f_len"),
      round(aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
        .cast("double") / col("n"), 6).as("f_wlen"),
      round(size(filter(col("toks"), t => array_contains(sw, t)))
        .cast("double") / col("n"), 6).as("f_stop"),
      round(size(filter(col("toks"), t => t.rlike("^[0-9]+$")))
        .cast("double") / col("n"), 6).as("f_digit"),
      round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
        / col("n"), 6).as("f_rep"))
    val z = round(lit(-1.2) + lit(0.35) * col("f_len")
      + lit(0.18) * col("f_wlen") + lit(2.0) * col("f_stop")
      - lit(3.0) * col("f_digit") - lit(2.5) * col("f_rep"), 9)
    feats.withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
  }

  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame =
    scoreDocs(Tables.documents(spark, sfDir))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= 0.5, 1L).otherwise(0L)).as("n_kept"),
        round(sum(col("score").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("avg_score"))
      .orderBy(col("source"))

  val qualityClassifierSql: String = {
    val swSql = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, source, $tokSql AS toks, len($tokSql) AS n
      |  FROM documents WHERE len($tokSql) > 0),
      |f AS (
      |  SELECT doc_id, source,
      |    ROUND(ln(1.0 + n), 9) AS f_len,
      |    ROUND(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / n, 6) AS f_wlen,
      |    ROUND(CAST(len(list_filter(toks, t -> list_contains($swSql, t))) AS DOUBLE) / n, 6) AS f_stop,
      |    ROUND(CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$$'))) AS DOUBLE) / n, 6) AS f_digit,
      |    ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n, 6) AS f_rep
      |  FROM d),
      |s AS (
      |  SELECT source,
      |    ROUND(1.0 / (1.0 + exp(-ROUND(-1.2 + 0.35 * f_len + 0.18 * f_wlen
      |      + 2.0 * f_stop - 3.0 * f_digit - 2.5 * f_rep, 9))), 6) AS score
      |  FROM f)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  ROUND(CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_score
      |FROM s GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- 3. token-budget sequence packing (q86) ------------------

  /** Pack token-window chunks into fixed [[PackBudget]]-token
    * training sequences the way pretraining pipelines actually do it:
    * concatenate the shard's token stream in a deterministic order
    * and cut every B tokens, so a chunk belongs to the sequence its
    * first token lands in (straddling is the documented semantics of
    * concat-then-split packing).
    *
    * The running offset is a window partitioned BY SHARD (source) —
    * packing is per-shard everywhere at scale; a global window would
    * serialize the corpus through one partition and is exactly what
    * this operator avoids.
    */
  val PackBudget = 512

  def seqPack(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
    val chunks = d.select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("n"), lit(48))).as("start"),
        col("n"))
      .withColumn("n_tok", least(lit(64), col("n") - col("start") + 1))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("doc_id"), col("start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = chunks
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("seq_no",
        ((col("cum") - col("n_tok")) / PackBudget).cast("long"))
    packed.groupBy(col("source"))
      .agg((max(col("seq_no")) + 1).as("n_seqs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tok")).cast("long").as("total_tokens"))
      .withColumn("fill_ratio", round(col("total_tokens").cast("double")
        / (col("n_seqs") * lit(PackBudget)), 6))
      .orderBy(col("source"))
  }

  val seqPackSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, source, len($tokSql) AS n
      |  FROM documents WHERE len($tokSql) > 0),
      |chunks AS (
      |  SELECT doc_id, source, start, LEAST(64, n - start + 1) AS n_tok
      |  FROM d CROSS JOIN LATERAL unnest(generate_series(1, n, 48)) AS t(start)),
      |packed AS (
      |  SELECT source, n_tok,
      |    (SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id, start) - n_tok)
      |      // $PackBudget AS seq_no
      |  FROM chunks)
      |SELECT source, CAST(MAX(seq_no) + 1 AS BIGINT) AS n_seqs, COUNT(*) AS n_chunks,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
      |  ROUND(CAST(SUM(n_tok) AS DOUBLE) / ((MAX(seq_no) + 1) * $PackBudget), 6) AS fill_ratio
      |FROM packed GROUP BY source ORDER BY source""".stripMargin

  // ---- q127: blocklist filtering -----------------------------------

  /** Exact-token blocklist (the C4 "bad words" pass shape; the list
    * itself is corpus-appropriate for the synthetic vocabulary). */
  val Blockwords: Seq[String] = Seq("slow", "spam", "casino")

  /** q127: blocklist filtering — flag documents containing any
    * blocked token (EXACT token match after the shared tokenizer, the
    * word-boundary discipline that keeps "classic" from tripping an
    * "ass" substring rule). Per-source report of flag rate and total
    * blocked occurrences.
    *
    * Shape: the block check is a scan-local array intersection
    * against a tiny literal set (codegen'd, no join, no shuffle);
    * the only exchange is the low-cardinality per-source rollup. */
  def blocklistFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val bw = array(Blockwords.map(lit): _*)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        graft.functions.TextOps.tokens(col("text")).as("toks"))
      .withColumn("n_blocked",
        size(filter(col("toks"), t => array_contains(bw, t))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_blocked") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_blocked")).as("blocked_occurrences"),
        round(sum(when(col("n_blocked") > 0, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("flag_rate"))
      .orderBy(col("source"))
  }

  val blocklistFilterSql: String = {
    val bwSql = Blockwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, source,
      |    len(list_filter($tokSql, t -> list_contains($bwSql, t)))
      |      AS n_blocked
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN n_blocked > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(SUM(n_blocked) AS BIGINT) AS blocked_occurrences,
      |  ROUND(CAST(SUM(CASE WHEN n_blocked > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*), 6) AS flag_rate
      |FROM d GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- q130: best-exemplar selection per stratum ---------------------

  /** q130: canonical/exemplar selection — for every (source, lang)
    * stratum keep the single highest-quality document (the "choose
    * the best duplicate" decision of a dedup pipeline, and the
    * exemplar pick of few-shot dataset curation). Selection runs as
    * MAX_BY over a packed order key: round(score·10⁶)·10⁷ − doc_id is
    * an exactly-representable integer-valued double that orders by
    * (score DESC, doc_id ASC) with no float-tie ambiguity — one
    * partial-agg shuffle, no window, no sort.
    */
  def bestExemplars(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    // scoreDocs projects to (doc_id, source, features); re-attach the
    // stratum's lang by key (broadcast-sized here; bucketed at scale)
    val scored = scoreDocs(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    scored
      .withColumn("key",
        round(col("score") * 1e6, 0) * lit(1e7) - col("doc_id"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max_by(col("doc_id"), col("key")).as("best_doc"),
        max(col("score")).as("best_score"))
      .orderBy(col("source"), col("lang"))
  }

  val bestExemplarsSql: String = {
    val swSql = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, source, lang, $tokSql AS toks, len($tokSql) AS n
      |  FROM documents WHERE len($tokSql) > 0),
      |f AS (
      |  SELECT doc_id, source, lang,
      |    ROUND(ln(1.0 + n), 9) AS f_len,
      |    ROUND(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / n, 6) AS f_wlen,
      |    ROUND(CAST(len(list_filter(toks, t -> list_contains($swSql, t))) AS DOUBLE) / n, 6) AS f_stop,
      |    ROUND(CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$$'))) AS DOUBLE) / n, 6) AS f_digit,
      |    ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n, 6) AS f_rep
      |  FROM d),
      |s AS (
      |  SELECT doc_id, source, lang,
      |    ROUND(1.0 / (1.0 + exp(-ROUND(-1.2 + 0.35 * f_len + 0.18 * f_wlen
      |      + 2.0 * f_stop - 3.0 * f_digit - 2.5 * f_rep, 9))), 6) AS score
      |  FROM f)
      |SELECT source, lang, COUNT(*) AS n_docs,
      |  arg_max(doc_id, ROUND(score * 1e6, 0) * 1e7 - doc_id) AS best_doc,
      |  MAX(score) AS best_score
      |FROM s GROUP BY source, lang ORDER BY source, lang""".stripMargin
  }
}
