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

  /** Oracle note (found by the r12 sf0.1 verify sweep): a FULLY
    * covered document keeps an EMPTY token list, and the two engines
    * render it differently — Spark's `concat_ws` returns '' for an
    * empty array while DuckDB's `array_to_string` returns NULL — so
    * the hash must COALESCE to '' for parity. Invisible at sf0.01
    * (threshold 5 is absolute: 500 docs produce no fully-covered
    * rows; 5000 docs produce 4595). */
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
      |  ('0x' || substr(md5(COALESCE(array_to_string(kept, ' '), '')), 1, 15))::BIGINT AS kept_hash
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
    * exposed so specs can probe the model on synthetic documents.
    * `carry` names input columns passed through unchanged, so a
    * consumer needing score + another attribute (q207/q208 want
    * n_chars) rides the ONE scoring scan instead of self-joining the
    * corpus back by doc_id. */
  def scoreDocs(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val d = docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
    val sw = array(Stopwords.map(lit): _*)
    val feats = d.select(Seq(col("doc_id"), col("source")) ++
      carry.map(col) ++ Seq(
      round(log(lit(1.0) + col("n")), 9).as("f_len"),
      round(aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
        .cast("double") / col("n"), 6).as("f_wlen"),
      round(size(filter(col("toks"), t => array_contains(sw, t)))
        .cast("double") / col("n"), 6).as("f_stop"),
      round(size(filter(col("toks"), t => t.rlike("^[0-9]+$")))
        .cast("double") / col("n"), 6).as("f_digit"),
      round(lit(1.0) - size(array_distinct(col("toks"))).cast("double")
        / col("n"), 6).as("f_rep")): _*)
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

  /** The quality-scoring CTE chain over an arbitrary
    * (doc_id, source, text) relation rendering `rel` — CTE names are
    * prefixed so two scored relations can coexist in one oracle
    * (q190 scores OLD and NEW snapshots side by side). */
  private[ops] def scoreCtesFor(rel: String, p: String): String = {
    val swSql = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""${p}d AS (
      |  SELECT doc_id, source, $tokSql AS toks, len($tokSql) AS n
      |  FROM $rel WHERE len($tokSql) > 0),
      |${p}f AS (
      |  SELECT doc_id, source,
      |    ROUND(ln(1.0 + n), 9) AS f_len,
      |    ROUND(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / n, 6) AS f_wlen,
      |    ROUND(CAST(len(list_filter(toks, t -> list_contains($swSql, t))) AS DOUBLE) / n, 6) AS f_stop,
      |    ROUND(CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$$'))) AS DOUBLE) / n, 6) AS f_digit,
      |    ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / n, 6) AS f_rep
      |  FROM ${p}d),
      |${p}s AS (
      |  SELECT doc_id, source,
      |    ROUND(1.0 / (1.0 + exp(-ROUND(-1.2 + 0.35 * f_len + 0.18 * f_wlen
      |      + 2.0 * f_stop - 3.0 * f_digit - 2.5 * f_rep, 9))), 6) AS score
      |  FROM ${p}f)""".stripMargin
  }

  /** The d/f/s quality-scoring CTE chain (the [[scoreDocs]] oracle
    * rendering, with doc_id carried through) — shared with the q147
    * canonical-keep oracle in [[Components]]. */
  private[ops] val scoreCtesSql: String = scoreCtesFor("documents", "")

  /** Per-doc scored points (doc_id, source, n_chars, score) — the
    * quality-vs-length relation shared by the Pareto skyline (q207)
    * and the OLS trend fit (q208). */
  private[graft] def scoredPoints(spark: SparkSession, sfDir: String): DataFrame =
    scoreDocs(graft.Tables.documents(spark, sfDir), carry = Seq("n_chars"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("score"))

  /** The [[scoredPoints]] CTE over [[scoreCtesSql]]'s `s` relation. */
  private[ops] val ptsCteSql: String =
    """pts AS (
      |  SELECT s.doc_id, s.source, d.n_chars, s.score
      |  FROM s JOIN documents d USING (doc_id))""".stripMargin

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

  // ---- q139: CCNet perplexity bucketing ------------------------

  /** q139: CCNet-style perplexity bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data"): train a PER-LANGUAGE LM, score every document by
    * mean token log-probability, and cut each language's corpus into
    * head / middle / tail TERCILES by that score — the bucket label
    * that downstream mixtures sample from ("head" = most fluent
    * third). The LM is the q69 add-1 unigram recipe keyed by
    * language (CCNet trains one KenLM per language for exactly this
    * reason: perplexity is only comparable within a language).
    *
    * Bucket rule: avg_lp ≥ the language's 2/3 quantile → head;
    * ≥ 1/3 quantile → middle; else tail (higher logprob = lower
    * perplexity = better). Quantiles are exact interpolated
    * percentiles rounded to 6 (the q132 engine-parity recipe), and
    * per-token/per-doc arithmetic follows q69's determinism rules
    * (ln rounded to 9, DECIMAL sums).
    *
    * Shape: one explode → (lang, tok) model join (unhinted — the
    * vocabulary is corpus-sized at web scale, the q69 lesson) → one
    * per-(lang, doc) partial agg → per-lang quantiles over the
    * per-doc relation (docs, not tokens) → broadcast cutpoints back
    * → ≤ |langs|·3-row rollup. The token stream crosses one shuffle.
    */
  def perplexityBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val stats = vocab.groupBy(col("lang")).agg(
      sum(col("cnt")).cast("double").as("total"),
      count(lit(1)).cast("double").as("vsize"))
    val scored = toks.join(vocab, Seq("lang", "tok"))
      .join(broadcast(stats), Seq("lang"))
      .withColumn("lp", round(
        log((col("cnt").cast("double") + 1.0)
          / (col("total") + col("vsize"))), 9))
    val perDoc = scored.groupBy(col("lang"), col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        round(sum(col("lp").cast("decimal(28,12)")).cast("double")
          / count(lit(1)), 6).as("avg_lp"))
    val cuts = perDoc.groupBy(col("lang")).agg(
      round(expr("percentile(avg_lp, CAST(2 AS DOUBLE) / 3)"), 6).as("c_head"),
      round(expr("percentile(avg_lp, CAST(1 AS DOUBLE) / 3)"), 6).as("c_mid"))
    perDoc.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("avg_lp") >= col("c_head"), "head")
          .when(col("avg_lp") >= col("c_mid"), "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(sum(col("avg_lp").cast("decimal(28,6)")).cast("double")
          / count(lit(1)), 6).as("avg_logprob"))
      .orderBy(col("lang"), col("bucket"))
  }

  val perplexityBucketsSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, lang, unnest($tokSql) AS tok FROM documents),
      |vocab AS (
      |  SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY lang, tok),
      |stats AS (
      |  SELECT lang, CAST(SUM(cnt) AS DOUBLE) AS total,
      |    CAST(COUNT(*) AS DOUBLE) AS vsize
      |  FROM vocab GROUP BY lang),
      |scored AS (
      |  SELECT t.doc_id, t.lang,
      |    ROUND(ln((CAST(v.cnt AS DOUBLE) + 1.0) / (s.total + s.vsize)), 9) AS lp
      |  FROM toks t
      |  JOIN vocab v ON t.lang = v.lang AND t.tok = v.tok
      |  JOIN stats s ON t.lang = s.lang),
      |perdoc AS (
      |  SELECT lang, doc_id, COUNT(*) AS n_toks,
      |    ROUND(CAST(SUM(CAST(lp AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS avg_lp
      |  FROM scored GROUP BY lang, doc_id),
      |cuts AS (
      |  SELECT lang,
      |    ROUND(quantile_cont(avg_lp, CAST(2 AS DOUBLE) / 3), 6) AS c_head,
      |    ROUND(quantile_cont(avg_lp, CAST(1 AS DOUBLE) / 3), 6) AS c_mid
      |  FROM perdoc GROUP BY lang),
      |b AS (
      |  SELECT p.lang,
      |    CASE WHEN avg_lp >= c_head THEN 'head'
      |         WHEN avg_lp >= c_mid THEN 'middle'
      |         ELSE 'tail' END AS bucket,
      |    n_toks, avg_lp
      |  FROM perdoc p JOIN cuts c ON p.lang = c.lang)
      |SELECT lang, bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |  ROUND(CAST(SUM(CAST(avg_lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
      |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  // ---- q140: quality-filter calibration sweep ------------------

  /** Threshold grid for the calibration sweep. */
  val CalibThresholds: Seq[Double] = (0 to 9).map(i => i / 10.0)

  /** q140: filter calibration curve — for each candidate keep
    * threshold t, how many documents survive `score ≥ t` and what the
    * survivors' average score is. This is the plot every pipeline
    * draws before picking the q84 classifier's operating point (too
    * low keeps junk, too high starves the mixture); publishing the
    * whole curve makes the chosen 0.5 auditable instead of folklore.
    *
    * Shape: per-doc scores stream through ONE scan-local conditional
    * aggregation — 10 thresholds become 20 partial-agg columns on a
    * single pass (no per-threshold rescan, no corpus × thresholds
    * row explosion), and the 1-row wide result unpivots to the
    * 10-row curve with `stack`. At 100 TB this is exactly one
    * codegen'd pass over the corpus. */
  def filterCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = scoreDocs(Tables.documents(spark, sfDir)).select(col("score"))
    val aggs: Seq[Column] = CalibThresholds.zipWithIndex.flatMap {
      case (t, i) => Seq(
        sum(when(col("score") >= t, 1L).otherwise(0L)).as(s"n$i"),
        sum(when(col("score") >= t, col("score").cast("decimal(28,6)")))
          .as(s"s$i"))
    }
    val allAggs = count(lit(1)).as("n_total") +: aggs
    val wide = scored.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = CalibThresholds.zipWithIndex
      .map { case (t, i) => s"${t}D, n$i, s$i" }.mkString(", ")
    wide.select(col("n_total"), expr(
        s"stack(${CalibThresholds.size}, $stackArgs) AS (t, n_kept, s_kept)"))
      .select(col("t"), col("n_total"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_total"), 6)
          .as("frac_kept"),
        when(col("n_kept") === 0L, lit(0.0))
          .otherwise(round(col("s_kept").cast("double")
            / col("n_kept"), 6)).as("avg_kept"))
      .orderBy(col("t"))
  }

  val filterCalibrationSql: String = {
    val swSql = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val condCols = CalibThresholds.zipWithIndex.map { case (t, i) =>
      s"""CAST(SUM(CASE WHEN score >= CAST($t AS DOUBLE) THEN 1 ELSE 0 END) AS BIGINT) AS n$i,
         |    SUM(CASE WHEN score >= CAST($t AS DOUBLE) THEN CAST(score AS DECIMAL(28,6)) END) AS s$i"""
        .stripMargin
    }.mkString(",\n    ")
    val rows = CalibThresholds.zipWithIndex.map { case (t, i) =>
      s"""SELECT CAST($t AS DOUBLE) AS t, n_total, n$i AS n_kept,
         |  ROUND(CAST(n$i AS DOUBLE) / n_total, 6) AS frac_kept,
         |  CASE WHEN n$i = 0 THEN 0.0
         |       ELSE ROUND(CAST(s$i AS DOUBLE) / n$i, 6) END AS avg_kept
         |FROM w""".stripMargin
    }.mkString("\nUNION ALL\n")
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
      |sc AS (
      |  SELECT ROUND(1.0 / (1.0 + exp(-ROUND(-1.2 + 0.35 * f_len + 0.18 * f_wlen
      |    + 2.0 * f_stop - 3.0 * f_digit - 2.5 * f_rep, 9))), 6) AS score
      |  FROM f),
      |w AS (
      |  SELECT COUNT(*) AS n_total,
      |    $condCols
      |  FROM sc)
      |$rows
      |ORDER BY t""".stripMargin
  }
}
