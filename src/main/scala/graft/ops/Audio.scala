package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-column plumbing with a REAL codec: RIFF/WAVE PCM s16le.
  *
  * The image path decodes real PNG/JPEG (`Media.scala`) and the PDF
  * path real FlateDecode streams (`PdfCodec.scala`); this closes the
  * audio third of the multimodal contract the same way. WAV-PCM needs
  * no codec library — the container format is a 1991-spec RIFF chunk
  * walk and the samples are raw little-endian int16 — so unlike the
  * q33/q97 honest-stub byte features, everything here is the real
  * thing: a spec-compliant WAV WRITER (44-byte canonical header,
  * even-padded chunks, junk LIST chunks interleaved so readers cannot
  * cheat with fixed offsets) and a strict chunk-walking READER
  * (magic + fmt validation, arbitrary chunk order, s16le decode).
  * The round-trip is cross-checked against the JDK's own
  * `javax.sound.sampled.AudioSystem` reader in AudioSpec.
  *
  * The workload on top is the first thing a speech-data pipeline runs:
  * VAD-style silence segmentation — 20 ms windows classified
  * silent/voiced by peak amplitude, per-clip voiced energy and
  * zero-crossing totals, rolled up by duration bucket. Every feature
  * is INTEGER-exact (sawtooth test signal, integer thresholds), so
  * the DuckDB oracle recomputes them from the closed-form waveform
  * definition without ever parsing bytes: if the writer or parser
  * mangles one sample, a checksum breaks.
  *
  * Scale shape: one row per clip end to end — synth and decode are
  * scan-local typed `mapPartitions` batches (the exact seam a JNI
  * ffmpeg/soundfile decode drops into), features reduce per clip
  * inside the batch (no per-sample rows cross any shuffle), and the
  * only exchange is the ≤3-bucket partial-agg rollup.
  */
object Audio {

  /** VAD window: 160 samples = 20 ms at 8 kHz. */
  val Window = 160

  /** Peak-amplitude threshold below which a window is silence. */
  val SilenceThreshold = 100

  case class Clip(clip_id: Long, content: Array[Byte])
  case class ClipFeatures(clip_id: Long, sample_rate: Int,
    duration_ms: Long, n_windows: Long, n_silent: Long,
    zero_crossings: Long, voiced_energy: Long)

  /** Closed-form deterministic test signal for clip `id`, sample `s`
    * (0-based): silent windows where `(w + id) % 4 == 0`, else a
    * sawtooth `((s % P) - P/2) * K`. Integer-only, mirrored verbatim
    * in the oracle SQL. */
  private[graft] def nSamples(id: Long): Int = (800 + (id % 11) * 160).toInt
  private[graft] def sampleRate(id: Long): Int = if (id % 2 == 0) 8000 else 16000
  private[graft] def period(id: Long): Int = (16 + (id % 7) * 8).toInt
  private[graft] def gain(id: Long): Int = (200 + (id % 5) * 50).toInt
  private[graft] def amplitude(id: Long, s: Int): Int = {
    val w = s / Window
    if ((w + id) % 4 == 0) 0
    else {
      val p = period(id)
      (s % p - p / 2) * gain(id)
    }
  }

  private def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
    b.write((v >> 16) & 0xff); b.write((v >> 24) & 0xff)
  }
  private def le16(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }

  /** Spec-compliant WAV writer: RIFF(WAVE) + fmt(PCM mono s16) +
    * data, with a junk LIST chunk BEFORE data on every third clip so
    * readers must actually walk chunks. */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val n = nSamples(id)
    val sr = sampleRate(id)
    val junk = id % 3 == 0
    val dataBytes = n * 2
    val junkBytes = if (junk) 8 + 12 else 0 // header + payload
    val out = new java.io.ByteArrayOutputStream(44 + junkBytes + dataBytes)
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + (8 + 16) + junkBytes + (8 + dataBytes)) // riff size
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    le32(out, 16)
    le16(out, 1)       // PCM
    le16(out, 1)       // mono
    le32(out, sr)
    le32(out, sr * 2)  // byte rate
    le16(out, 2)       // block align
    le16(out, 16)      // bits per sample
    if (junk) {
      out.write("LIST".getBytes("US-ASCII"))
      le32(out, 12)
      out.write("INFOgraftpad".getBytes("US-ASCII"))
    }
    out.write("data".getBytes("US-ASCII"))
    le32(out, dataBytes)
    var s = 0
    while (s < n) { le16(out, amplitude(id, s) & 0xffff); s += 1 }
    out.toByteArray
  }

  /** Strict chunk-walking WAV reader: validates RIFF/WAVE magics and
    * a PCM mono s16 fmt chunk, skips unknown chunks (with odd-size
    * padding per spec), returns (sampleRate, samples). Throws on
    * malformed input — ingest wants loud failures, not garbage
    * features (the q55 PDF contract). */
  private[graft] def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    val riffSize = bb.getInt
    require(riffSize == bytes.length - 8, "RIFF size mismatch")
    require(tag() == "WAVE", "not a WAVE file")
    var sr = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val id = tag()
      val size = bb.getInt
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          require(bb.getShort == 1, "not PCM")
          require(bb.getShort == 1, "not mono")
          sr = bb.getInt
          bb.getInt            // byte rate
          bb.getShort          // block align
          require(bb.getShort == 16, "not 16-bit")
          bb.position(bb.position() + (size - 16) + (size & 1))
        case "data" =>
          require(sr > 0, "data chunk before fmt")
          samples = new Array[Short](size / 2)
          bb.asShortBuffer().get(samples)
        case _ =>
          bb.position(bb.position() + size + (size & 1))
      }
    }
    require(samples != null, "no data chunk")
    (sr, samples)
  }

  /** One clip per supplier row, the real WAV bytes in one binary cell. */
  def clipTable(spark: SparkSession, sfDir: String): Dataset[Clip] = {
    import spark.implicits._
    Tables.supplier(spark, sfDir).select(col("s_suppkey").as("clip_id"))
      .as[Long].mapPartitions(_.map(id => Clip(id, encodeWav(id))))
  }

  private def featurize(rows: Iterator[Clip]): Iterator[ClipFeatures] =
    rows.map { c =>
      val (sr, a) = decodeWav(c.content)
      val n = a.length
      val nw = n / Window
      var w = 0; var silent = 0L
      while (w < nw) {
        var peak = 0; var s = w * Window
        val end = s + Window
        while (s < end) {
          val v = math.abs(a(s).toInt); if (v > peak) peak = v; s += 1
        }
        if (peak < SilenceThreshold) silent += 1
        w += 1
      }
      var zc = 0L; var energy = 0L
      var s = 1
      while (s < n) {
        if (a(s - 1).toInt * a(s).toInt < 0) zc += 1
        s += 1
      }
      s = 0
      while (s < n) {
        if ((s / Window + c.clip_id) % 4 != 0) { // voiced windows only
          val v = a(s).toLong; energy += v * v
        }
        s += 1
      }
      ClipFeatures(c.clip_id, sr, n.toLong * 1000 / sr, nw.toLong, silent,
        zc, energy)
    }

  /** q141: decode every clip, segment silence, roll up by duration
    * bucket — every output integer is exact, so the oracle's
    * closed-form recompute is a bit-for-bit gate on the codec. */
  def silenceSegmentation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    clipTable(spark, sfDir).mapPartitions(featurize).toDF()
      .withColumn("bucket",
        when(col("duration_ms") < 100, lit("short"))
          .when(col("duration_ms") < 200, lit("medium"))
          .otherwise(lit("long")))
      .groupBy(col("bucket")).agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_windows")).as("n_windows"),
        sum(col("n_silent")).as("n_silent"),
        sum(col("zero_crossings")).as("zero_crossings"),
        sum(col("voiced_energy")).as("voiced_energy"))
      .orderBy(col("bucket"))
  }

  /** The waveform's closed form, mirrored: DuckDB never sees bytes —
    * it recomputes what the decoded samples MUST be. */
  val silenceSegmentationSql: String =
    s"""WITH clips AS (
      |  SELECT s_suppkey AS clip_id,
      |    CAST(800 + (s_suppkey % 11) * 160 AS BIGINT) AS n,
      |    CASE WHEN s_suppkey % 2 = 0 THEN 8000 ELSE 16000 END AS sr,
      |    16 + (s_suppkey % 7) * 8 AS p,
      |    200 + (s_suppkey % 5) * 50 AS k
      |  FROM supplier),
      |samples AS (
      |  SELECT clip_id, n, sr, s,
      |    CASE WHEN ((s // $Window) + clip_id) % 4 = 0 THEN 0
      |         ELSE ((s % p) - p // 2) * k END AS amp
      |  FROM clips CROSS JOIN LATERAL unnest(generate_series(0, n - 1)) AS t(s)),
      |win AS (
      |  SELECT clip_id, s // $Window AS w, MAX(ABS(amp)) AS peak
      |  FROM samples GROUP BY clip_id, s // $Window),
      |silc AS (
      |  SELECT clip_id, COUNT(*) AS n_windows,
      |    SUM(CASE WHEN peak < $SilenceThreshold THEN 1 ELSE 0 END) AS n_silent
      |  FROM win GROUP BY clip_id),
      |zc AS (
      |  SELECT clip_id,
      |    SUM(CASE WHEN amp * prev < 0 THEN 1 ELSE 0 END) AS zero_crossings,
      |    COALESCE(SUM(CASE WHEN ((s // $Window) + clip_id) % 4 <> 0
      |      THEN CAST(amp AS BIGINT) * amp END), 0) AS voiced_energy
      |  FROM (SELECT clip_id, s, amp,
      |          LAG(amp) OVER (PARTITION BY clip_id ORDER BY s) AS prev
      |        FROM samples)
      |  GROUP BY clip_id),
      |per_clip AS (
      |  SELECT c.clip_id, n * 1000 // sr AS duration_ms,
      |    silc.n_windows, silc.n_silent, zc.zero_crossings, zc.voiced_energy
      |  FROM clips c
      |  JOIN silc ON c.clip_id = silc.clip_id
      |  JOIN zc ON c.clip_id = zc.clip_id)
      |SELECT CASE WHEN duration_ms < 100 THEN 'short'
      |            WHEN duration_ms < 200 THEN 'medium'
      |            ELSE 'long' END AS bucket,
      |  COUNT(*) AS n_clips,
      |  CAST(SUM(n_windows) AS BIGINT) AS n_windows,
      |  CAST(SUM(n_silent) AS BIGINT) AS n_silent,
      |  CAST(SUM(zero_crossings) AS BIGINT) AS zero_crossings,
      |  CAST(SUM(voiced_energy) AS BIGINT) AS voiced_energy
      |FROM per_clip
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------
  // q177: sample-rate unification (resample through the real codec)
  // --------------------------------------------------------------

  /** Common target rate: the corpus mixes 8 kHz and 16 kHz clips, a
    * speech model wants ONE rate — 12 kHz forces a genuinely
    * fractional ratio both ways (3/2 up, 3/4 down), so the
    * interpolation path is real, not a stride pick. */
  val TargetRate = 12000

  case class ResampleRow(clip_id: Long, src_rate: Int, n_out: Long,
    sum_out: Long, wsum_out: Long)

  /** Linear interpolation at rational positions with TRUNCATING
    * integer division (Scala `/` ≡ DuckDB `//` — both truncate
    * toward zero, checked): for output index k, source position is
    * k·src/dst; out = (in(i)·(dst−r) + in(i+1)·r) / dst with
    * r = k·src mod dst, and the r = 0 tail reads in(i) alone, so the
    * last output never indexes past the end. Integer-exact ⇒ the
    * oracle recomputes every resampled sample bit-for-bit. */
  private[graft] def resampleLinear(in: Array[Short], src: Int,
      dst: Int): Array[Long] = {
    val n = in.length
    val nOut = ((n - 1).toLong * dst / src + 1).toInt
    val out = new Array[Long](nOut)
    var k = 0
    while (k < nOut) {
      val num = k.toLong * src
      val i = (num / dst).toInt
      val r = num % dst
      out(k) =
        if (r == 0) in(i).toLong
        else (in(i).toLong * (dst - r) + in(i + 1).toLong * r) / dst
      k += 1
    }
    out
  }

  private def resampleFeatures(rows: Iterator[Clip]): Iterator[ResampleRow] =
    rows.map { c =>
      val (sr, samples) = decodeWav(c.content)
      val out = resampleLinear(samples, sr, TargetRate)
      var sum = 0L; var wsum = 0L; var k = 0
      while (k < out.length) {
        sum += out(k)
        wsum += out(k) * (k % 17 + 1) // order-sensitive checksum
        k += 1
      }
      ResampleRow(c.clip_id, sr, out.length.toLong, sum, wsum)
    }

  /** q177: decode every clip through the real WAV codec, resample to
    * [[TargetRate]], roll up per source rate with an order-sensitive
    * checksum — one wrong or swapped interpolated sample anywhere
    * breaks the hash. Scale shape: identical to q141 (scan-local
    * decode+resample, one row per clip to the ≤2-group rollup). */
  def resampleCensus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    clipTable(spark, sfDir).mapPartitions(resampleFeatures).toDF()
      .groupBy(col("src_rate")).agg(
        count(lit(1)).as("n_clips"),
        sum(col("n_out")).as("n_out"),
        sum(col("sum_out")).as("sum_out"),
        sum(col("wsum_out")).as("wsum_out"))
      .orderBy(col("src_rate"))
  }

  /** Oracle: closed-form waveform → identical rational-position
    * truncating interpolation, never touching bytes. */
  val resampleCensusSql: String =
    s"""WITH clips AS (
      |  SELECT s_suppkey AS clip_id,
      |    CAST(800 + (s_suppkey % 11) * 160 AS BIGINT) AS n,
      |    CASE WHEN s_suppkey % 2 = 0 THEN 8000 ELSE 16000 END AS sr,
      |    16 + (s_suppkey % 7) * 8 AS p,
      |    200 + (s_suppkey % 5) * 50 AS k
      |  FROM supplier),
      |outidx AS (
      |  SELECT clip_id, n, sr, p, k,
      |    unnest(generate_series(0, (n - 1) * $TargetRate // sr)) AS o
      |  FROM clips),
      |interp AS (
      |  SELECT clip_id, sr, o,
      |    (o * sr) // $TargetRate AS i,
      |    (o * sr) % $TargetRate AS r,
      |    p, k, n
      |  FROM outidx),
      |amps AS (
      |  SELECT clip_id, sr, o, r,
      |    CASE WHEN ((i // $Window) + clip_id) % 4 = 0 THEN 0
      |         ELSE ((i % p) - p // 2) * k END AS a0,
      |    CASE WHEN r = 0 THEN 0
      |         WHEN (((i + 1) // $Window) + clip_id) % 4 = 0 THEN 0
      |         ELSE (((i + 1) % p) - p // 2) * k END AS a1
      |  FROM interp),
      |res AS (
      |  SELECT clip_id, sr, o,
      |    CASE WHEN r = 0 THEN CAST(a0 AS BIGINT)
      |         ELSE (CAST(a0 AS BIGINT) * ($TargetRate - r)
      |               + CAST(a1 AS BIGINT) * r) // $TargetRate END AS v
      |  FROM amps)
      |SELECT CAST(sr AS INT) AS src_rate,
      |  CAST(COUNT(DISTINCT clip_id) AS BIGINT) AS n_clips,
      |  CAST(COUNT(*) AS BIGINT) AS n_out,
      |  CAST(SUM(v) AS BIGINT) AS sum_out,
      |  CAST(SUM(v * (o % 17 + 1)) AS BIGINT) AS wsum_out
      |FROM res
      |GROUP BY sr
      |ORDER BY src_rate""".stripMargin
}
