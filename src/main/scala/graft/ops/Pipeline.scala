package graft.ops

import graft.{Corpus, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators beyond the dedup/ANN families:
  * token-window chunking, within-document repetition scoring, PII
  * scrubbing, per-domain quotas, and benchmark-contamination
  * detection. All are single-scan column-expression pipelines (or
  * signature-keyed joins for contamination), shaped to hold at
  * 100 TB: no per-doc driver work, shuffles carry ids + small keys.
  */
object Pipeline {

  private val tokSql = TextOps.tokSql()

  // ---- 1. token-window chunking --------------------------------

  /** Chunk documents into 64-token windows with 16-token overlap
    * (stride 48) — the standard pretokenization step before packing
    * sequences for training. One scan, explode over per-doc window
    * starts; each chunk is identified by a 60-bit content hash so the
    * oracle verifies text content without hauling full chunk strings
    * through the diff. */
  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("n", size(col("toks")))
    d.select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(1), col("n"), lit(48))).as("start"))
      .select(
        col("doc_id"),
        ((col("start") - 1) / 48).cast("long").as("chunk_id"),
        least(lit(64), col("n") - col("start") + 1).cast("long")
          .as("n_tokens"),
        TextOps.hash60(concat_ws(" ", slice(col("toks"), col("start"),
          lit(64)))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val chunkDocsSql: String =
    s"""WITH d AS (
      |  SELECT doc_id, $tokSql AS toks, len($tokSql) AS n
      |  FROM documents WHERE doc_id < 20),
      |chunks AS (
      |  SELECT doc_id, (start - 1) // 48 AS chunk_id,
      |    LEAST(64, n - start + 1) AS n_tokens,
      |    ('0x' || substr(md5(array_to_string(toks[start:start+63], ' ')), 1, 15))::BIGINT AS chunk_hash
      |  FROM d CROSS JOIN LATERAL unnest(generate_series(1, n, 48)) AS t(start))
      |SELECT doc_id, chunk_id, n_tokens, chunk_hash
      |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin

  // ---- 2. within-document repetition ---------------------------

  /** Gopher-style repetition signal: fraction of 3-gram occurrences
    * that are repeats of an earlier 3-gram in the same document
    * (1 - distinct/total). High values flag boilerplate/spam for
    * quality filtering. */
  def repetitionScore(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).filter(col("doc_id") < 50)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        TextOps.shinglesFromTokens(col("toks")).as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("total_grams"),
        size(array_distinct(col("grams"))).cast("long").as("distinct_grams"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("distinct_grams").cast("double")
          / col("total_grams"), 6))
      .orderBy(col("doc_id"))

  val repetitionScoreSql: String = {
    val grams =
      s"""CASE WHEN len($tokSql) < 3 THEN [COALESCE(array_to_string($tokSql, ' '), '')]
         |     ELSE list_transform(generate_series(1, len($tokSql) - 2),
         |            i -> array_to_string(($tokSql)[i:i+2], ' ')) END""".stripMargin
    s"""WITH g AS (SELECT doc_id, $grams AS grams
      |  FROM documents WHERE doc_id < 50)
      |SELECT doc_id, CAST(len(grams) AS BIGINT) AS total_grams,
      |  CAST(len(list_distinct(grams)) AS BIGINT) AS distinct_grams,
      |  ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6) AS rep_ratio
      |FROM g ORDER BY doc_id""".stripMargin
  }

  // ---- 3. PII scrubbing ----------------------------------------

  /** PII scrub: count and redact email addresses and phone-shaped
    * tokens. The corpus plants deterministic PII on doc_id%5==0 rows
    * (both engines synthesize the identical rows); the scrubbed text
    * is verified by content hash. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val emailPat = "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+"
    val phonePat = "\\b\\d{3}-\\d{4}\\b"
    val d = Tables.documents(spark, sfDir).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-"),
            format_string("%04d", pmod(col("doc_id"), lit(10000))),
            lit(" now")))
          .otherwise(col("text")).as("text"))
    d.select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailPat), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phonePat), lit(0)))
          .cast("long").as("n_phones"),
        TextOps.hash60(regexp_replace(regexp_replace(col("text"),
          emailPat, "[EMAIL]"), phonePat, "[PHONE]")).as("scrubbed_hash"))
      .orderBy(col("doc_id"))
  }

  val piiScrubSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0
      |         THEN text || ' contact user' || doc_id || '@example.com or 555-'
      |              || printf('%04d', doc_id % 10000) || ' now'
      |         ELSE text END AS text
      |  FROM documents WHERE doc_id < 100)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
      |  ('0x' || substr(md5(
      |    regexp_replace(regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '[EMAIL]', 'g'),
      |      '\b\d{3}-\d{4}\b', '[PHONE]', 'g')), 1, 15))::BIGINT AS scrubbed_hash
      |FROM d ORDER BY doc_id""".stripMargin

  // ---- 4. per-domain quota -------------------------------------

  /** Per-domain document quota: keep the top-3 pages per domain by
    * quality score — the crawl-corpus balancing step that stops one
    * domain from dominating the training mix. Runs through the
    * engine's custom bounded-heap physical operator
    * ([[graft.plans.TopKPerKey]]): O(n log k) per partition, no sort,
    * single hash exchange on domain. The order column folds the id
    * in at 1e-12 scale so every score is unique (ids < 2^20, quality
    * quantized at 1e-6) — deterministic selection, no heap ties. */
  def domainQuota(spark: SparkSession, sfDir: String): DataFrame = {
    val wp = Corpus.webPages(spark, sfDir)
      .withColumn("q", TextOps.qualityScore(col("content")))
      .withColumn("score", col("q") - col("id").cast("double") * 1e-12)
      .select(col("id"), col("domain"), col("q"), col("score"))
    val kept = graft.plans.TopKPerKey.perKey(wp, Seq("domain"), "score", 3)
    kept.groupBy(col("domain")).agg(
        count(lit(1)).as("n_kept"),
        sum(col("id")).as("kept_id_sum"),
        min(col("q")).as("min_quality"))
      .orderBy(col("domain"))
  }

  val domainQuotaSql: String = {
    // same quality formula as TextAnalysis.qualityBySourceSql, over
    // web_pages content, with the id tiebreak in the window ORDER BY
    val stop = TextOps.langProfiles.head._2.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    val tokC = TextOps.tokSql("content")
    s"""WITH ${Corpus.webPagesCte},
      |scored AS (
      |  SELECT id, domain, ROUND((
      |      LEAST(length(content) / 500.0, 1.0)
      |      + CASE WHEN length(content) > 0
      |             THEN length(regexp_replace(content, '[^A-Za-z]', '', 'g')) / CAST(length(content) AS DOUBLE)
      |             ELSE 0.0 END
      |      + LEAST(CASE WHEN len($tokC) > 0
      |              THEN len(list_filter($tokC, t -> list_contains($stop, t)))
      |                   / CAST(len($tokC) AS DOUBLE) * 4.0
      |              ELSE 0.0 END, 1.0)
      |    ) / 3.0, 6) AS q
      |  FROM web_pages),
      |kept AS (
      |  SELECT id, domain, q FROM (
      |    SELECT id, domain, q,
      |      ROW_NUMBER() OVER (PARTITION BY domain
      |        ORDER BY q - id * 1e-12 DESC) AS rn
      |    FROM scored)
      |  WHERE rn <= 3)
      |SELECT domain, COUNT(*) AS n_kept, CAST(SUM(id) AS BIGINT) AS kept_id_sum,
      |  MIN(q) AS min_quality
      |FROM kept GROUP BY domain ORDER BY domain""".stripMargin
  }

  // ---- 5. source mixture sampling ------------------------------

  /** Temperature-scaled source mixing (the data-mixing step of a
    * training run): per-source weights w_s = n_s^0.7 (temperature
    * 0.7 up-weights small sources relative to proportional
    * sampling), normalized to shares, converted to per-source keep
    * rates for a fixed target size, then drawn with the auditable
    * deterministic hash rule (same doc always in or out). One
    * aggregate for the mixture table (broadcast back), one filtered
    * scan for the draw. */
  def sourceMix(spark: SparkSession, sfDir: String,
      target: Int = 500): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val bySource = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(pow(col("n_docs").cast("double"), 0.7), 6))
    val norm = bySource.agg(
      round(sum(col("w").cast("decimal(28,8)")).cast("double"), 6).as("norm"))
    val rates = bySource.crossJoin(broadcast(norm))
      .withColumn("share", round(col("w") / col("norm"), 6))
      .withColumn("rate", least(lit(1.0),
        round(col("share") * target / col("n_docs"), 6)))
      .select(col("source"), col("n_docs"), col("share"), col("rate"))
    val sampled = d.join(broadcast(rates), Seq("source"))
      .filter(pmod(TextOps.hash60(concat(lit("mix"), col("doc_id"))),
        lit(1000000L)).cast("double") < col("rate") * 1e6)
      .groupBy(col("source")).agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("share"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("source"))
  }

  val sourceMixSql: String =
    """WITH by_source AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    ROUND(pow(CAST(COUNT(*) AS DOUBLE), 0.7), 6) AS w
      |  FROM documents GROUP BY source),
      |norm AS (
      |  SELECT ROUND(CAST(SUM(CAST(w AS DECIMAL(28,8))) AS DOUBLE), 6) AS norm
      |  FROM by_source),
      |rates AS (
      |  SELECT source, n_docs,
      |    ROUND(w / norm, 6) AS share,
      |    LEAST(1.0, ROUND(ROUND(w / norm, 6) * 500 / n_docs, 6)) AS rate
      |  FROM by_source CROSS JOIN norm),
      |sampled AS (
      |  SELECT d.source, COUNT(*) AS n_sampled
      |  FROM documents d JOIN rates r ON r.source = d.source
      |  WHERE CAST(('0x' || substr(md5('mix' || d.doc_id), 1, 15))::BIGINT % 1000000 AS DOUBLE)
      |        < r.rate * 1e6
      |  GROUP BY d.source)
      |SELECT source, n_docs, share, COALESCE(n_sampled, 0) AS n_sampled
      |FROM rates LEFT JOIN sampled USING (source)
      |ORDER BY source""".stripMargin

  // ---- 6. exact stratified quota sample ------------------------

  /** Exact-size stratified sample: EXACTLY k documents per language
    * (rate-based sampling like q51/q70 only hits sizes in
    * expectation). Deterministic: rank within each stratum by a hash
    * of the doc id and keep the k smallest — auditable (a doc's
    * membership is reproducible) and executed by the custom
    * bounded-heap operator in ascending mode: O(n log k) per
    * partition, no per-stratum sort. */
  def stratifiedQuota(spark: SparkSession, sfDir: String,
      k: Int = 20): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        TextOps.hash60(concat(lit("strat"), col("doc_id"))).as("hk"))
    val kept = graft.plans.TopKPerKey.perKey(d, Seq("lang"), "hk", k,
      desc = false)
    kept.groupBy(col("lang")).agg(
        count(lit(1)).as("n_sampled"),
        sum(col("doc_id")).as("sampled_id_sum"))
      .orderBy(col("lang"))
  }

  val stratifiedQuotaSql: String =
    """WITH ranked AS (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY ('0x' || substr(md5('strat' || doc_id), 1, 15))::BIGINT) AS rn
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_sampled,
      |  CAST(SUM(doc_id) AS BIGINT) AS sampled_id_sum
      |FROM ranked WHERE rn <= 20
      |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- 7. benchmark contamination ------------------------------

  /** Contamination check: which corpus documents contain an 8-gram of
    * a held-out benchmark set? (The decontamination step every
    * training pipeline runs against eval suites.) The benchmark is
    * the doc_id<5 slice; planted contaminated rows (300000+b) embed
    * each benchmark text verbatim behind a prefix. Candidates come
    * from an equi-join on 8-gram hashes — shuffle carries (id, hash)
    * only. */
  def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val planted = d.filter(col("doc_id") < 5)
      .select((col("doc_id") + 300000).as("doc_id"),
        concat(lit("prefix words then "), col("text")).as("text"))
    val corpus = d.select(col("doc_id"), col("text")).unionByName(planted)
    def grams(df: DataFrame) = df
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          TextOps.shinglesFromTokens(col("toks"), 8),
          s => TextOps.hash60(s)))).as("g"))
    val bench = grams(d.filter(col("doc_id") < 5))
      .select(col("doc_id").as("bench_id"), col("g"))
    val corp = grams(corpus.filter(col("doc_id") >= 5))
    corp.join(bench, Seq("g"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("doc_id")).as("n_contaminated_docs"),
        count(lit(1)).as("n_shared_grams"))
      .orderBy(col("bench_id"))
  }

  val contaminationSql: String = {
    val grams8 =
      s"""list_distinct(list_transform(
         |  CASE WHEN len($tokSql) < 8 THEN [COALESCE(array_to_string($tokSql, ' '), '')]
         |       ELSE list_transform(generate_series(1, len($tokSql) - 7),
         |              i -> array_to_string(($tokSql)[i:i+7], ' ')) END,
         |  s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))""".stripMargin
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id, 'prefix words then ' || text AS text
      |  FROM documents WHERE doc_id < 5),
      |bench AS (
      |  SELECT doc_id AS bench_id, unnest($grams8) AS g
      |  FROM documents WHERE doc_id < 5),
      |corp AS (
      |  SELECT doc_id, unnest($grams8) AS g
      |  FROM corpus WHERE doc_id >= 5)
      |SELECT bench_id, COUNT(DISTINCT doc_id) AS n_contaminated_docs,
      |  COUNT(*) AS n_shared_grams
      |FROM corp JOIN bench USING (g)
      |GROUP BY bench_id ORDER BY bench_id""".stripMargin
  }

  // ---- q138: decode-loop artifact detection ------------------------

  /** A period-p loop needs ≥3 full repeats to count (run length in
    * the match string ≥ 2p positions). */
  val LoopRepeats = 3

  /** q138: model-generated decode-loop detection — the degenerate
    * "the cat the cat the cat …" repetition that greedy/low-temp
    * decoding produces and that corpus filters must catch before
    * synthetic text re-enters training. A document loops with period
    * p iff tokens satisfy t[i] = t[i+p] over a long stretch; q60's
    * distinct/total repetition score misses this (a long doc with one
    * loop still has high distinct fraction), so this op measures the
    * LONGEST CONSECUTIVE RUN of period-p matches for p ∈ {1,2,3}.
    *
    * Run length is computed engine-portably with the string-run
    * trick: the per-position match flags become a '1'/'0' string,
    * split on '0', max fragment length — no sequential fold, no UDF.
    * A period-p run of length L means (L+p)/p repeats; flag at
    * ≥ [[LoopRepeats]] (run ≥ 2p).
    *
    * The corpus plants loop docs (+400000: a trigram repeated 8×
    * appended) so the detector provably fires; both engines build the
    * same plant.
    *
    * Shape: entirely scan-local per-document array math (zero
    * exchanges before the ≤20-row per-source rollup) — the ideal
    * 100 TB filter shape. */
  def loopArtifacts(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val planted = d.filter(pmod(col("doc_id"), lit(40)) === 0)
      .select((col("doc_id") + 400000).as("doc_id"), col("source"),
        concat(col("text"),
          lit(" loop the gain" * 8)).as("text"))
    val corpus = d.select(col("doc_id"), col("source"), col("text"))
      .unionByName(planted)
    def maxRun(p: Int): org.apache.spark.sql.Column = {
      val n = size(col("toks"))
      val flags = transform(sequence(lit(1), n - lit(p)),
        i => when(element_at(col("toks"), i)
          === element_at(col("toks"), i + lit(p)), lit("1"))
          .otherwise(lit("0")))
      when(n > p,
        array_max(transform(split(array_join(flags, ""), "0"), length _)))
        .otherwise(lit(0))
    }
    val scored = corpus
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        maxRun(1).as("r1"), maxRun(2).as("r2"), maxRun(3).as("r3"))
    scored.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("r1") >= 1 * (LoopRepeats - 1), 1L).otherwise(0L))
          .as("n_loop1"),
        sum(when(col("r2") >= 2 * (LoopRepeats - 1), 1L).otherwise(0L))
          .as("n_loop2"),
        sum(when(col("r3") >= 3 * (LoopRepeats - 1), 1L).otherwise(0L))
          .as("n_loop3"),
        max(col("r3")).cast("long").as("max_run3"))
      .orderBy(col("source"))
  }

  val loopArtifactsSql: String = {
    val plantTail = " loop the gain" * 8
    def maxRunSql(p: Int): String =
      s"""CASE WHEN len(toks) > $p THEN COALESCE(list_max(list_transform(
         |      string_split(array_to_string(list_transform(
         |        generate_series(1, len(toks) - $p),
         |        i -> CASE WHEN toks[i] = toks[i + $p]
         |             THEN '1' ELSE '0' END), ''), '0'),
         |      r -> len(r))), 0) ELSE 0 END""".stripMargin
    s"""WITH corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 400000 AS doc_id, source,
      |    text || '$plantTail' AS text
      |  FROM documents WHERE doc_id % 40 = 0),
      |scored AS (
      |  SELECT doc_id, source,
      |    ${maxRunSql(1)} AS r1,
      |    ${maxRunSql(2)} AS r2,
      |    ${maxRunSql(3)} AS r3
      |  FROM (SELECT doc_id, source, $tokSql AS toks FROM corpus))
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN r1 >= ${1 * (LoopRepeats - 1)} THEN 1 ELSE 0 END) AS BIGINT) AS n_loop1,
      |  CAST(SUM(CASE WHEN r2 >= ${2 * (LoopRepeats - 1)} THEN 1 ELSE 0 END) AS BIGINT) AS n_loop2,
      |  CAST(SUM(CASE WHEN r3 >= ${3 * (LoopRepeats - 1)} THEN 1 ELSE 0 END) AS BIGINT) AS n_loop3,
      |  CAST(MAX(r3) AS BIGINT) AS max_run3
      |FROM scored GROUP BY source ORDER BY source""".stripMargin
  }
}
