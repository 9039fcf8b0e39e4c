package graft

import graft.ops.{Avi, Media, Video}

/** The AVI container contract: byte-exact mux→demux roundtrip, RIFF
  * structural details (word alignment, header fields), the MJPG
  * (JPEG-frame) flavor cross-decoding through the shared image codec,
  * and loud rejection of corrupt bytes. The lossless MPNG path is
  * oracle-hashed by q97; this spec pins everything the oracle can't
  * see. */
class VideoSpec extends SparkSpec {

  private def frames(n: Int): Seq[Array[Byte]] =
    (0 until n).map(i => Video.frameBytes(1000L + i, i)).map(Media.pngBytes)

  test("AVI mux → demux roundtrip preserves frame bytes exactly") {
    val fs = frames(7)
    val avi = Avi.write(fs, 4, 4, "MPNG", fps = 10)
    val av = Avi.read(avi)
    assert(av.width === 4 && av.height === 4)
    assert(av.totalFrames === 7 && av.frames.length === 7)
    assert(av.handler === "MPNG")
    assert(av.microSecPerFrame === 100000)
    av.frames.zip(fs).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.sameElements(want), s"frame $i bytes differ after roundtrip")
    }
  }

  test("odd-size frame payloads honor RIFF word alignment") {
    // PNG sizes vary; force odd sizes explicitly with raw payloads
    val odd = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7, 8),
      Array[Byte](9))
    val av = Avi.read(Avi.write(odd, 4, 4, "MPNG"))
    assert(av.frames.length === 3)
    av.frames.zip(odd).foreach { case (got, want) =>
      assert(got.sameElements(want),
        "padding byte leaked into (or truncated) an odd-size frame")
    }
  }

  test("MJPG flavor: JPEG frames cross-decode through the image codec") {
    val src = (0 until 4).map(i => Video.frameBytes(7L, i))
    val avi = Avi.write(src.map(Media.jpegBytes), 4, 4, "MJPG")
    val av = Avi.read(avi)
    assert(av.handler === "MJPG")
    av.frames.zip(src).foreach { case (jpeg, bytes) =>
      // real JFIF SOI magic on every frame chunk
      assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8,
        "frame chunk is not a JPEG codestream")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(img.getWidth === 4 && img.getHeight === 4)
      // lossy codec: mean survives within the loose DCT tolerance
      // MediaSpec uses for the still-image JPEG tier
      val srcMean = bytes.map(_ & 0xff).sum.toDouble / 16
      var sum = 0
      for (y <- 0 until 4; x <- 0 until 4)
        sum += img.getRaster.getSample(x, y, 0)
      assert(math.abs(sum / 16.0 - srcMean) < 32.0)
    }
  }

  test("muxVideo MJPG flavor parses and decodes end to end") {
    val av = Avi.read(Video.muxVideo(42L, 9, "MJPG"))
    assert(av.totalFrames === 9 && av.handler === "MJPG")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(av.frames(4)))
    assert(img.getWidth === 4 && img.getHeight === 4)
  }

  test("corrupt containers are rejected loudly, not guessed at") {
    val good = Avi.write(frames(3), 4, 4, "MPNG")
    intercept[IllegalArgumentException](Avi.read("nope".getBytes))
    // wrong form type
    val notAvi = good.clone(); "WAVE".getBytes.copyToArray(notAvi, 8)
    intercept[IllegalArgumentException](Avi.read(notAvi))
    // truncated mid-chunk: a frame chunk overruns its parent
    intercept[IllegalArgumentException](
      Avi.read(java.util.Arrays.copyOfRange(good, 0, good.length - 7)))
  }

  test("frame chunks from non-vids streams never leak into the frame vector") {
    // hand-muxed two-stream AVI: an 'auds' stream declared FIRST (so
    // the video stream is 01), with audio '00wb' chunks interleaved
    // in movi — a conformant layout real muxers emit
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def chunk(id: String, data: Array[Byte]) =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if ((data.length & 1) == 1) Array[Byte](0) else Array.empty[Byte])
    def list(t: String, p: Array[Byte]) =
      "LIST".getBytes("US-ASCII") ++ le32(p.length + 4) ++
        t.getBytes("US-ASCII") ++ p
    val avih = chunk("avih", le32(100000) ++ le32(0) ++ le32(0) ++
      le32(0x10) ++ le32(2) ++ le32(0) ++ le32(2) ++ le32(0) ++
      le32(4) ++ le32(4) ++ Array.fill[Byte](16)(0))
    def strh(typ: String, hdl: String) = chunk("strh",
      typ.getBytes("US-ASCII") ++ hdl.getBytes("US-ASCII") ++
        Array.fill[Byte](48)(0))
    val strf = chunk("strf", Array.fill[Byte](40)(0))
    val hdrl = list("hdrl", avih ++
      list("strl", strh("auds", "NONE") ++ strf) ++
      list("strl", strh("vids", "MPNG") ++ strf))
    val f0 = Array[Byte](10, 11, 12)
    val f1 = Array[Byte](20, 21, 22, 23)
    val movi = list("movi",
      chunk("00wb", Array[Byte](1, 2, 3, 4)) ++ chunk("01dc", f0) ++
        chunk("00wb", Array[Byte](5, 6)) ++ chunk("01dc", f1))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val av = Avi.read("RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body)
    assert(av.handler === "MPNG")
    assert(av.frames.length === 2, "audio chunks leaked into frames")
    assert(av.frames(0).sameElements(f0) && av.frames(1).sameElements(f1))
    // a second vids stream is a loud failure, not silent interleaving
    val hdrl2 = list("hdrl", avih ++
      list("strl", strh("vids", "MPNG") ++ strf) ++
      list("strl", strh("vids", "MPNG") ++ strf))
    val body2 = "AVI ".getBytes("US-ASCII") ++ hdrl2 ++ movi
    val ex = intercept[IllegalArgumentException](Avi.read(
      "RIFF".getBytes("US-ASCII") ++ le32(body2.length) ++ body2))
    assert(ex.getMessage.contains("multiple 'vids'"))
  }

  test("demux slices only sampled frames — decode is on-demand") {
    // parse cost model: read() returns raw codestreams; nothing is
    // image-decoded until the caller touches a frame. Sample indexes
    // outside the stride are never decoded in frameSample — proven
    // here by decoding ONLY stride frames and matching the q97 math.
    val n = 13
    val av = Avi.read(Video.muxVideo(5L, n))
    val strided = (0 until n by Video.Stride)
    val feats = strided.map { i =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(av.frames(i)))
      (0 until 16).map(p => img.getRaster.getSample(p % 4, p / 4, 0)).sum
    }
    val expect = strided.map(i => Video.frameBytes(5L, i).map(_ & 0xff).sum)
    assert(feats == expect)
  }
}
