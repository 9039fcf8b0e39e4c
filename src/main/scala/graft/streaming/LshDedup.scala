package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the MinHash-LSH banding of
  * q24 applied to a LIVE ingest stream: each arriving document's
  * 16-perm signature splits into 4 bands, each band key routes to a
  * stateful bucket, and the bucket assigns the document a CANONICAL
  * id (the smallest doc_id the bucket has ever seen). A document
  * whose canonical differs from itself in ANY band collided with an
  * earlier near-duplicate and can be suppressed at ingest — before
  * it costs storage, embedding, or indexing.
  *
  * The signature math (tokenizer, 3-shingles, md5-based 60-bit
  * hashes, LCG permutation coefficients, 4×4 banding) is the SAME
  * formulation as the batch q24 — pinned by a spec that recomputes
  * batch band keys per document and compares. Arrival order decides
  * which duplicate becomes canonical (min-id within what has been
  * seen), which is the inherent streaming-vs-retrospective gap; the
  * batch job remains the nightly ground truth.
  *
  * Scale shape: state is ONE long per occupied band bucket; the
  * stream shuffles (band_key, doc_id) pairs — 4 rows of ~24 bytes per
  * document, never text or shingle sets. In production the state gets
  * a watermark/TTL eviction (dup windows are temporal); the spec uses
  * NoTimeout for determinism.
  */
object LshDedup {

  val Perms = 16
  val Bands = 4
  val RowsPerBand = 4

  case class Doc(doc_id: Long, text: String)
  case class BandRow(bkey: String, doc_id: Long)
  case class Assignment(doc_id: Long, bkey: String, canonical_id: Long)

  /** Scala mirror of `TextOps.tokens` (\\w+-ish lowercase runs). */
  def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").toSeq.filter(_.nonEmpty)

  /** Scala mirror of `TextOps.hash60` (first 15 md5 hex digits). */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Scala mirror of `TextOps.shingleHashesFromTokens` (distinct
    * 3-gram hashes; whole text when shorter). */
  def shingleHashes(text: String): Seq[Long] = {
    val t = tokens(text)
    val shingles =
      if (t.length < 3) Seq(t.mkString(" "))
      else t.sliding(3).map(_.mkString(" ")).toSeq
    shingles.map(hash60).distinct
  }

  /** Band keys in the exact q24 formulation: minhash under the shared
    * LCG coefficients, 4 rows concatenated per band, band index
    * prefixed. */
  def bandKeys(text: String): Seq[String] = {
    val sh = shingleHashes(text)
    val sig = Dedup.minhashCoeffs.take(Perms).map { case (a, b) =>
      sh.map(x => (a * java.lang.Math.floorMod(x, Dedup.P31) + b)
        % Dedup.P31).min
    }
    (0 until Bands).map { bi =>
      val rows = (0 until RowsPerBand).map(ri => sig(bi * RowsPerBand + ri))
      s"$bi:" + rows.mkString("-")
    }
  }

  /** Stateful canonical assignment over a document stream: per band
    * bucket, canonical = min(doc_id seen so far, including this
    * micro-batch) — min is order-insensitive within a batch, so the
    * result depends only on the batch SPLIT, not shuffle arrival. */
  def assignCanonical(docs: Dataset[Doc]): Dataset[Assignment] = {
    import docs.sparkSession.implicits._
    docs
      .flatMap(d => bandKeys(d.text).map(k => BandRow(k, d.doc_id)))
      .groupByKey(_.bkey)
      .flatMapGroupsWithState[Long, Assignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (bkey: String, rows: Iterator[BandRow], state: GroupState[Long]) =>
          val ids = rows.map(_.doc_id).toSeq
          val canonical = math.min(
            state.getOption.getOrElse(Long.MaxValue), ids.min)
          state.update(canonical)
          ids.iterator.map(id => Assignment(id, bkey, canonical))
      }
  }

  /** Micro-batches the declared q157 stream replays (doc routed by
    * `doc_id % StreamBatches`, one staged file per batch). */
  val StreamBatches = 4

  /** q157: the streaming LSH dedup as a DECLARED query — the REAL
    * `flatMapGroupsWithState` path (file-source stream, one staged
    * file per micro-batch, parquet-sink append of every canonical
    * assignment), replayed over the q24 near-dup corpus and rolled
    * up so DuckDB can certify the corpus the STREAM deduplicated.
    *
    * Determinism: the batch SPLIT is closed-form (`doc_id %
    * StreamBatches`) and the batch ORDER is pinned by staging each
    * batch as one file with strictly increasing modification times
    * (the file source drains oldest-first under `maxFilesPerTrigger
    * 1` — hard-asserted ≥ 2 data micro-batches). Within a batch the
    * bucket canonical is a min — shuffle-order-insensitive — so the
    * assignment depends only on (split, order), both pinned. That
    * makes the inherently ORDER-DEPENDENT streaming answer (an early
    * arrival is kept even when a smaller-id near-dup arrives later —
    * the streaming-vs-retrospective gap q24 closes nightly)
    * oracle-checkable: DuckDB recomputes canonical-at-arrival as
    * `min(doc_id) over same-bucket rows with batch ≤ mine`.
    *
    * Scale shape: state is one long per occupied band bucket; each
    * micro-batch shuffles (band_key, doc_id) pairs only — 4 rows of
    * ~24 bytes per document, never text or shingle sets — and the
    * sink appends assignment rows. The rollup reads the sink's
    * parquet, not driver memory. */
  def streamedDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = graft.Scratch.dir("stream_lsh", sfDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val stage = new java.io.File(base, "stage")
    stage.mkdirs()
    // materialize the corpus once (r16, guide §2.4): the four staged
    // writes below each re-ran the corpusNear union + text scan and
    // the coalesce(1) collapsed each of those scans to ONE task; off
    // the pin they are cheap block reads
    val docs = graft.ops.Materialize.pin(Dedup.corpusNear(spark, sfDir))
    (0 until StreamBatches).foreach { b =>
      val tmp = s"$base/tmp$b"
      docs.filter(pmod(col("doc_id"), lit(StreamBatches.toLong)) === b)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-")
          && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $tmp"))
      val dst = new java.io.File(stage, f"b$b%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // strictly increasing mtimes pin the drain order (fixed epoch
      // base keeps reruns byte-identical)
      require(dst.setLastModified(1400000000000L + b * 60000L),
        s"cannot pin mtime on $dst")
    }
    val src = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.getAbsolutePath).as[Doc]
    // spread the CPU-bound signature pass (tokenize + 16 minhash
    // perms per doc in [[bandKeys]]) across the cores: each staged
    // file is ONE input split, so without this every micro-batch
    // computed its signatures in a single task (guide §2.5 input
    // skew — the r15 video-codec fix, applied to the stream). The
    // per-bucket canonical is a min over the batch, so the batch
    // SPLIT alone fixes the answer; partitioning within it cannot.
    val par = src.repartition(spark.sparkContext.defaultParallelism)
    val q = StreamTune.withStatePartitions(spark) {
      assignCanonical(par).writeStream
        .outputMode("append").format("parquet")
        .option("path", s"$base/assign")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
    }
    try q.processAllAvailable() finally q.stop()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    require(batches >= 2,
      s"streaming dedup must run multiple micro-batches, saw $batches")
    spark.read.parquet(s"$base/assign")
      .groupBy(col("doc_id")).agg(min(col("canonical_id")).as("mc"))
      .withColumn("batch", pmod(col("doc_id"), lit(StreamBatches.toLong)))
      .groupBy(col("batch")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("mc") < col("doc_id"), 1L).otherwise(0L))
          .as("n_suppressed"),
        sum(when(col("mc") < col("doc_id"), col("doc_id"))
          .otherwise(lit(0L))).as("suppressed_id_sum"))
      .orderBy(col("batch"))
  }

  /** DuckDB recomputes the stream's answer from the pinned batch
    * split/order: canonical at arrival = min same-bucket doc_id with
    * batch ≤ mine (band keys via the shared q24 CTE chain — DuckDB
    * never sees a stream or any state). */
  val streamedDedupSql: String =
    s"""WITH ${Dedup.corpusNearCte},
      |${Dedup.bandInvCtes},
      |binv AS (
      |  SELECT doc_id, doc_id % $StreamBatches AS batch, bkey FROM inv),
      |assign AS (
      |  SELECT a.doc_id, a.bkey, MIN(b.doc_id) AS canonical
      |  FROM binv a JOIN binv b
      |    ON a.bkey = b.bkey AND b.batch <= a.batch
      |  GROUP BY 1, 2),
      |perdoc AS (
      |  SELECT doc_id, doc_id % $StreamBatches AS batch,
      |    MIN(canonical) AS mc
      |  FROM assign GROUP BY 1, 2)
      |SELECT batch, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN mc < doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_suppressed,
      |  CAST(SUM(CASE WHEN mc < doc_id THEN doc_id ELSE 0 END) AS BIGINT)
      |    AS suppressed_id_sum
      |FROM perdoc GROUP BY batch ORDER BY batch""".stripMargin
}
