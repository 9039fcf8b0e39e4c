package graft.ops

import graft.Tables
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q227: T5-style span corruption — the curate→training-example
  * TRANSFORM (Raffel et al., JMLR 2020 §3.1.4): mask contiguous token
  * spans, replace each with a numbered sentinel in the input, and emit
  * the masked spans behind their sentinels as the target. q86 packs
  * finished sequences; nothing in the suite produced the
  * denoising-objective (input, target) pair itself — the last
  * transform between a curated corpus and an actual pretraining batch.
  *
  * Determinism (the whole point at the oracle gate): T5 samples span
  * positions; this operator uses the SYSTEMATIC variant — the token
  * stream splits into fixed [[Block]]-token blocks and each full block
  * masks exactly one [[Span]]-token span whose offset is the engine's
  * md5 rule (`hash60("sc<doc_id>_<block>") % (Block-Span+1)`). That
  * pins the corruption rate at exactly Span/Block = 15% per full
  * block, makes spans non-overlapping BY CONSTRUCTION (no sequential
  * rejection pass — every block is independent, so the transform is
  * embarrassingly parallel at any scale), and lets DuckDB replay the
  * identical example bytes.
  *
  * Scale shape: one codegen'd scan — tokenize, per-block offsets, and
  * both renderings are array HOFs (transform/slice/flatten/concat_ws)
  * evaluated scan-local; no join, no aggregation, nothing
  * corpus-proportional crosses a shuffle (the trailing orderBy is gate
  * presentation, not pipeline semantics). Block boundaries never look
  * across documents, so a 100 TB corpus corrupts partition-parallel
  * with zero coordination.
  *
  * Empty-list parity (the q81 class): input_text can go empty only
  * for a zero-token document (corpus contract: ≥10 tokens), and the
  * oracle COALESCEs its rendering; target_text always carries the
  * terminal sentinel, so it can never be empty.
  */
object SpanCorrupt {

  /** Tokens per corruption block; one span masks per FULL block. */
  val Block = 20
  /** Masked span length ⇒ corruption rate Span/[[Block]] = 15%. */
  val Span = 3

  private def sentinel(b: Column): Column =
    concat(lit("<extra_id_"), b.cast("string"), lit(">"))

  /** 0-based span start for block `b` (int column) of `doc_id`. */
  private def spanStart(docId: Column, b: Column): Column =
    (b.cast("long") * Block) + pmod(
      TextOps.hash60(concat(lit("sc"), docId.cast("string"), lit("_"),
        b.cast("string"))),
      lit((Block - Span + 1).toLong))

  def spanCorrupt(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("source"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("nblk", floor(col("n") / Block).cast("long"))
      // per-block 0-based span starts; sequence(0, -1) would DESCEND
      // in Spark, so the zero-block case short-circuits to empty
      .withColumn("starts",
        when(col("nblk") > 0, transform(
          sequence(lit(0L), col("nblk") - 1),
          b => spanStart(col("doc_id"), b)))
          .otherwise(array().cast("array<long>")))
    // input: per block [prefix][sentinel_b][suffix], then the
    // un-blocked tail — pure slices, no per-token indexing, so there
    // is no out-of-bounds edge for ANSI mode to trip on
    val pieces = transform(col("starts"), (st, b) => {
      val blkStart = b.cast("long") * Block
      val stI = st.cast("int")
      concat(
        slice(col("toks"), (blkStart + 1).cast("int"),
          (st - blkStart).cast("int")),
        array(sentinel(b)),
        slice(col("toks"), stI + Span + 1,
          (blkStart + Block - st).cast("int") - Span))
    })
    val tail = slice(col("toks"), (col("nblk") * Block + 1).cast("int"),
      (col("n") - col("nblk") * Block).cast("int"))
    val inputToks = concat(flatten(pieces), tail)
    // target: sentinel_b + masked span per block, terminal sentinel
    val targetToks = concat(
      flatten(transform(col("starts"), (st, b) =>
        concat(array(sentinel(b)),
          slice(col("toks"), st.cast("int") + 1, lit(Span))))),
      array(sentinel(col("nblk"))))
    d.select(
      col("doc_id"), col("source"),
      col("n").as("n_tokens"),
      col("nblk").as("n_spans"),
      (col("nblk") * Span).as("n_masked"),
      concat_ws(" ", inputToks).as("input_text"),
      concat_ws(" ", targetToks).as("target_text"))
      .orderBy(col("doc_id"))
  }

  val spanCorruptSql: String = {
    val tok = TextOps.tokSql()
    val B = Block
    val L = Span
    // 0-based span start of the block containing 1-based token i
    def stOf(blk: String) =
      s"($blk) * $B + ('0x' || substr(md5('sc' || doc_id || '_' || ($blk)), 1, 15))::BIGINT % ${B - L + 1}"
    s"""WITH d AS (
      |  SELECT doc_id, source, $tok AS toks FROM documents),
      |s AS (
      |  SELECT doc_id, source, toks, len(toks) AS n, len(toks) // $B AS nblk
      |  FROM d),
      |blk AS (
      |  SELECT doc_id, b.b, ${stOf("b.b")} AS st
      |  FROM s, unnest(generate_series(0, nblk - 1)) AS b(b)),
      |tokraw AS (
      |  SELECT doc_id, t.i AS i, toks[t.i] AS tk, nblk
      |  FROM s, unnest(generate_series(1, n)) AS t(i)),
      |tok AS (
      |  -- the span offset joins in from blk (one md5 per BLOCK, not
      |  -- per token); tail tokens past the last full block get NULL
      |  -- st, which the first CASE branch below short-circuits
      |  SELECT tr.doc_id, tr.i, tr.tk, tr.nblk, b.st
      |  FROM tokraw tr LEFT JOIN blk b
      |    ON b.doc_id = tr.doc_id AND b.b = (tr.i - 1) // $B),
      |itok AS (
      |  SELECT doc_id, i,
      |    CASE WHEN (i - 1) // $B >= nblk OR (i - 1) < st OR (i - 1) >= st + $L
      |           THEN tk
      |         WHEN (i - 1) = st
      |           THEN '<extra_id_' || ((i - 1) // $B) || '>'
      |         ELSE NULL END AS otok
      |  FROM tok),
      |inp AS (
      |  SELECT doc_id, string_agg(otok, ' ' ORDER BY i) AS input_text
      |  FROM itok WHERE otok IS NOT NULL GROUP BY doc_id),
      |tgt AS (
      |  SELECT blk.doc_id,
      |    string_agg('<extra_id_' || b || '> ' ||
      |      array_to_string(toks[st + 1 : st + $L], ' '), ' ' ORDER BY b)
      |      AS tgt_body
      |  FROM blk JOIN s USING (doc_id) GROUP BY blk.doc_id)
      |SELECT s.doc_id, s.source, n AS n_tokens, nblk AS n_spans,
      |  nblk * $L AS n_masked,
      |  COALESCE(inp.input_text, '') AS input_text,
      |  COALESCE(tgt.tgt_body || ' ', '') || '<extra_id_' || nblk || '>'
      |    AS target_text
      |FROM s
      |LEFT JOIN inp ON inp.doc_id = s.doc_id
      |LEFT JOIN tgt ON tgt.doc_id = s.doc_id
      |ORDER BY s.doc_id""".stripMargin
  }
}
