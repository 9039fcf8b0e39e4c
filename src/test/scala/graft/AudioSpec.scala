package graft

import graft.ops.Audio

/** The real-codec audio path: the WAV writer must produce files the
  * JDK's own `javax.sound.sampled.AudioSystem` reader accepts and
  * decodes to the SAME samples as our chunk-walking parser; the
  * parser must enforce the RIFF invariants (reject truncation, junk
  * magics); and the q141 features must match a from-scratch replay of
  * the closed-form waveform.
  */
class AudioSpec extends SparkSpec {

  test("WAV roundtrip: AudioSystem and our parser decode identical samples") {
    // junk-chunk clips (id % 3 == 0) and both sample rates included
    for (id <- Seq(0L, 1L, 2L, 3L, 6L, 7L, 10L)) {
      val bytes = Audio.encodeWav(id)
      val (sr, ours) = Audio.decodeWav(bytes)
      assert(sr === (if (id % 2 == 0) 8000 else 16000))

      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      assert(fmt.getSampleRate.toInt === sr)
      assert(fmt.getSampleSizeInBits === 16)
      assert(fmt.getChannels === 1)
      assert(!fmt.isBigEndian)
      val raw = in.readAllBytes()
      val jdk = java.nio.ByteBuffer.wrap(raw)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val jdkSamples = new Array[Short](raw.length / 2)
      jdk.asShortBuffer().get(jdkSamples)
      assert(jdkSamples.length === ours.length, s"clip $id length")
      assert(jdkSamples.toSeq === ours.toSeq, s"clip $id samples")
      // and both match the closed-form signal
      ours.zipWithIndex.foreach { case (v, s) =>
        assert(v.toInt === Audio.amplitude(id, s), s"clip $id sample $s")
      }
    }
  }

  test("parser rejects malformed input loudly") {
    val good = Audio.encodeWav(5L)
    intercept[IllegalArgumentException] {
      Audio.decodeWav(good.take(40)) // truncated: RIFF size mismatch
    }
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](Audio.decodeWav(notRiff))
    val notWave = good.clone(); notWave(8) = 'X'.toByte
    intercept[IllegalArgumentException](Audio.decodeWav(notWave))
  }

  test("silence segmentation matches a from-scratch waveform replay") {
    val got = Audio.silenceSegmentation(spark, sfDir).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_clips"), r.getAs[Long]("n_windows"),
          r.getAs[Long]("n_silent"), r.getAs[Long]("zero_crossings"),
          r.getAs[Long]("voiced_energy"))).toMap
    val ids = Tables.supplier(spark, sfDir)
      .select("s_suppkey").collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    val expected = ids.map { id =>
      val n = Audio.nSamples(id)
      val sr = Audio.sampleRate(id)
      val a = (0 until n).map(Audio.amplitude(id, _))
      val nw = n / Audio.Window
      val silent = (0 until nw).count { w =>
        a.slice(w * Audio.Window, (w + 1) * Audio.Window)
          .map(math.abs).max < Audio.SilenceThreshold
      }
      val zc = (1 until n).count(s => a(s - 1) * a(s) < 0)
      val energy = a.map(v => v.toLong * v).sum
      val dur = n.toLong * 1000 / sr
      val bucket = if (dur < 100) "short" else if (dur < 200) "medium"
        else "long"
      (bucket, nw.toLong, silent.toLong, zc.toLong, energy)
    }
    val byBucket = expected.groupBy(_._1)
    assert(got.keySet === byBucket.keySet)
    byBucket.foreach { case (b, rs) =>
      assert(got(b) === ((rs.length.toLong, rs.map(_._2).sum,
        rs.map(_._3).sum, rs.map(_._4).sum, rs.map(_._5).sum)), s"bucket $b")
    }
    // the carve produces all three buckets and real silence
    assert(got.keySet === Set("short", "medium", "long"))
    assert(got.values.map(_._3).sum > 0)
  }

  test("resampleLinear: identity, decimation, and hand-checked interpolation") {
    import graft.ops.Audio
    val in = Array[Short](0, 100, -200, 300, 50)
    // src == dst: identity
    assert(Audio.resampleLinear(in, 8000, 8000).toSeq ===
      in.map(_.toLong).toSeq)
    // 2:1 decimation hits exact source positions only
    assert(Audio.resampleLinear(in, 16000, 8000).toSeq ===
      Seq(0L, -200L, 50L))
    // 3:2 fractional: positions 0, 1.5, 3 -> in(1)+(in(2)-in(1))*1/2
    // with truncating division: (100*1 + (-200)*1)/2 = -50
    assert(Audio.resampleLinear(in, 12000, 8000).toSeq ===
      Seq(0L, -50L, 300L))
    // endpoints always survive when the last position aligns
    val up = Audio.resampleLinear(in, 8000, 12000)
    assert(up.head == in.head.toLong && up.last == in.last.toLong)
    assert(up.length == 7) // (5-1)*12000/8000 + 1
  }

  test("q177 rollup covers both source rates with nonzero output") {
    val rows = graft.ops.Audio.resampleCensus(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq.sorted === Seq(8000, 16000))
    rows.foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getLong(4) != 0, "order-sensitive checksum must be nonzero")
    }
  }
}
