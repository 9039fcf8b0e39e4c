package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-domain politeness rate limiting — the crawl-scheduling policy
  * the reference delegates to Scrapy's per-domain concurrency
  * settings (`settings.py` CONCURRENT_REQUESTS defaults; robots
  * crawl-delay semantics). In a streaming deployment the frontier is
  * a stream of fetch candidates; each domain holds a token bucket in
  * `flatMapGroupsWithState`, and candidates beyond the refill rate
  * are deferred (emitted with `admitted = false`) for a later
  * micro-batch rather than dropped — at-least-once preserving.
  *
  * The bucket is deterministic: capacity [[Capacity]], refill
  * [[RefillPerBatch]] tokens per micro-batch (processing-time
  * semantics, Q4 — no event-time clock exists in the reference), so
  * a spec can compute the exact admit/defer split for any input.
  *
  * Scale shape: state is two longs per DOMAIN (not per URL); the
  * stream shuffles once on domain — the same partitioning the
  * per-domain output sink wants anyway.
  */
object RateLimit {

  val Capacity = 5L
  val RefillPerBatch = 3L

  case class Candidate(domain: String, url: String)
  case class Bucket(tokens: Long, batches_seen: Long)
  case class Verdict(domain: String, url: String, admitted: Boolean,
      tokens_left: Long)

  /** Token-bucket admission over a candidate stream grouped by
    * domain. URLs are processed in lexicographic order within a
    * (domain, batch) group so admission is deterministic under
    * shuffle-arrival reordering. */
  def admit(candidates: Dataset[Candidate]): Dataset[Verdict] = {
    import candidates.sparkSession.implicits._
    candidates
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Bucket, Verdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (domain: String, batch: Iterator[Candidate],
         state: GroupState[Bucket]) =>
          val prev = state.getOption.getOrElse(Bucket(Capacity, 0L))
          var tokens =
            if (prev.batches_seen == 0L) prev.tokens
            else math.min(Capacity, prev.tokens + RefillPerBatch)
          val verdicts = batch.toSeq.sortBy(_.url).map { c =>
            if (tokens > 0L) {
              tokens -= 1L
              Verdict(domain, c.url, admitted = true, tokens)
            } else Verdict(domain, c.url, admitted = false, 0L)
          }
          state.update(Bucket(tokens, prev.batches_seen + 1L))
          verdicts.iterator
      }
  }

  // ---- q238: the token bucket on a VIRTUAL clock -------------------

  /** Logical ticks the q238 replay stages (one file per tick). */
  val VTicks = 4

  case class TimedCandidate(domain: String, url: String, vtime: Long)
  case class VBucket(tokens: Long, last_v: Long, seen: Boolean)
  case class VVerdict(domain: String, url: String, vtime: Long,
      admitted: Boolean)

  /** Token-bucket admission on a LOGICAL clock threaded through the
    * data (r14 VERDICT #4): each candidate carries `vtime`, and the
    * per-domain refill is [[RefillPerBatch]] × elapsed TICKS (capped
    * at [[Capacity]]) instead of once per micro-batch seen. That
    * makes the admit/deny sequence a pure function of the staged
    * rows — independent of wall time, of which micro-batch a row
    * lands in, and even of micro-batch COALESCING (two ticks arriving
    * in one batch fold identically, because the group folds its rows
    * in (vtime, url) order and refills at each tick boundary; the
    * additive refill commutes with the capacity cap across merged
    * ticks) — so a DuckDB oracle can replay it closed-form, where the
    * processing-time [[admit]] variant could only ever be
    * spec-checked.
    *
    * Scale shape: unchanged from [[admit]] — state is two longs and a
    * flag per DOMAIN, the stream shuffles once on domain. */
  def admitVirtual(candidates: Dataset[TimedCandidate]): Dataset[VVerdict] = {
    import candidates.sparkSession.implicits._
    candidates
      .groupByKey(_.domain)
      .flatMapGroupsWithState[VBucket, VVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (domain: String, batch: Iterator[TimedCandidate],
         state: GroupState[VBucket]) =>
          val prev = state.getOption
            .getOrElse(VBucket(Capacity, 0L, seen = false))
          var tokens = prev.tokens
          var lastV = prev.last_v
          var seen = prev.seen
          val out = batch.toSeq.sortBy(c => (c.vtime, c.url)).map { c =>
            if (!seen) { seen = true; lastV = c.vtime }
            else if (c.vtime > lastV) {
              tokens = math.min(Capacity,
                tokens + RefillPerBatch * (c.vtime - lastV))
              lastV = c.vtime
            }
            if (tokens > 0L) {
              tokens -= 1L
              VVerdict(domain, c.url, c.vtime, admitted = true)
            } else VVerdict(domain, c.url, c.vtime, admitted = false)
          }
          state.update(VBucket(tokens, lastV, seen))
          out.iterator
      }
  }

  /** Candidate corpus for the q238 replay — two traffic families so
    * the replay provably exercises every bucket transition:
    * `<source>` (every document, tick = doc_id % [[VTicks]]) is a
    * SUSTAINED overload — admit [[Capacity]] at tick 0, then exactly
    * [[RefillPerBatch]] per tick; `<source>.burst` (ticks 0 and 3
    * only) drains at tick 0, is ABSENT for two ticks, and its tick-3
    * refill 3 × [[RefillPerBatch]] must hit the capacity CAP — the
    * multi-tick refill arithmetic the per-batch [[admit]] cannot
    * express. */
  private[graft] def candidates(spark: SparkSession,
      sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source").as("domain"),
        concat(lit("https://"), col("source"), lit("/d/"), col("doc_id"))
          .as("url"),
        pmod(col("doc_id"), lit(VTicks.toLong)).as("vtime"))
      .unionByName(
        Tables.documents(spark, sfDir)
          .filter(pmod(col("doc_id"), lit(VTicks.toLong)).isin(0L, 3L))
          .select(concat(col("source"), lit(".burst")).as("domain"),
            concat(lit("https://"), col("source"), lit("/d/"), col("doc_id"))
              .as("url"),
            pmod(col("doc_id"), lit(VTicks.toLong)).as("vtime")))

  /** q238: the virtual-clock token bucket as a DECLARED query — a
    * REAL `flatMapGroupsWithState` stream (one staged file per tick,
    * mtime-pinned oldest-first drain hard-asserted all [[VTicks]]
    * micro-batches, parquet-sink append of every verdict), rolled up
    * per (domain, tick): arrivals, admitted, denied. The rollup is
    * additionally order-PROOF: within a (domain, tick) the admitted
    * COUNT is min(tokens, arrivals) whichever URLs win the tokens. */
  def ratedAdmission(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = graft.Scratch.dir("stream_ratelimit", sfDir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val stage = new java.io.File(base, "stage")
    stage.mkdirs()
    // materialized once (r16, guide §2.4): the four per-tick staged
    // writes each re-ran the two-way documents union under a
    // coalesce(1) single task; off the pin they are block reads
    val cand = graft.ops.Materialize.pin(candidates(spark, sfDir))
    (0 until VTicks).foreach { b =>
      val tmp = s"$base/tmp$b"
      cand.filter(col("vtime") === b.toLong)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-")
          && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part written under $tmp"))
      val dst = new java.io.File(stage, f"b$b%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      require(dst.setLastModified(1400000000000L + b * 60000L),
        s"cannot pin mtime on $dst")
    }
    val src = spark.readStream
      .schema("domain STRING, url STRING, vtime BIGINT")
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.getAbsolutePath).as[TimedCandidate]
    val q = StreamTune.withStatePartitions(spark) {
      admitVirtual(src).writeStream
        .outputMode("append").format("parquet")
        .option("path", s"$base/verdicts")
        .option("checkpointLocation", s"$base/ckpt")
        .start()
    }
    try q.processAllAvailable() finally q.stop()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    require(batches >= VTicks,
      s"rate-limit replay must drain all $VTicks staged ticks, saw $batches")
    spark.read.parquet(s"$base/verdicts")
      .groupBy(col("domain"), col("vtime"))
      .agg(count(lit(1)).as("n_arrivals"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"))
      .withColumn("n_denied", col("n_arrivals") - col("n_admitted"))
      .orderBy(col("domain"), col("vtime"))
  }

  /** DuckDB replay: the bucket recurrence unrolled over the
    * [[VTicks]] ticks on a DENSE (domain, tick) grid (a domain
    * absent at a tick still refills — exactly the virtual-clock
    * semantics; `min(Capacity, t + k·refill)` applied tick-at-a-time
    * equals the one-shot multi-tick refill because refills are
    * additive and the cap commutes): tok₀ = Capacity,
    * adm = min(tok, arrivals), tokₙ₊₁ = min(Capacity, tok − adm +
    * refill). Only (domain, tick) cells with arrivals publish. */
  val ratedAdmissionSql: String = {
    val ticks = (1 until VTicks).map { v =>
      s"""s$v AS (
         |  SELECT g.domain, g.a,
         |    LEAST(LEAST($Capacity, p.tok + $RefillPerBatch), g.a) AS adm,
         |    LEAST($Capacity, p.tok + $RefillPerBatch)
         |      - LEAST(LEAST($Capacity, p.tok + $RefillPerBatch), g.a) AS tok
         |  FROM grid g JOIN s${v - 1} p USING (domain) WHERE g.v = $v)"""
        .stripMargin
    }.mkString(",\n")
    val rows = (0 until VTicks).map(v =>
      s"""SELECT domain, CAST($v AS BIGINT) AS vtime,
         |  CAST(a AS BIGINT) AS n_arrivals, CAST(adm AS BIGINT) AS n_admitted,
         |  CAST(a - adm AS BIGINT) AS n_denied FROM s$v WHERE a > 0"""
        .stripMargin)
      .mkString("\nUNION ALL ")
    s"""WITH cand AS (
      |  SELECT source AS domain, doc_id % $VTicks AS v FROM documents
      |  UNION ALL
      |  SELECT source || '.burst', doc_id % $VTicks FROM documents
      |  WHERE doc_id % $VTicks IN (0, 3)),
      |arr AS (SELECT domain, v, COUNT(*) AS a FROM cand GROUP BY 1, 2),
      |grid AS (
      |  SELECT d.domain, t.v, COALESCE(a.a, 0) AS a
      |  FROM (SELECT DISTINCT domain FROM arr) d
      |  CROSS JOIN generate_series(0, ${VTicks - 1}) AS t(v)
      |  LEFT JOIN arr a ON a.domain = d.domain AND a.v = t.v),
      |s0 AS (
      |  SELECT domain, a, LEAST($Capacity, a) AS adm,
      |    $Capacity - LEAST($Capacity, a) AS tok
      |  FROM grid WHERE v = 0),
      |$ticks
      |$rows
      |ORDER BY domain, vtime""".stripMargin
  }
}
