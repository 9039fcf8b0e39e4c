package graft

import org.apache.spark.sql.functions._

import graft.ops.Media

/** The real-codec image path: PNG encode → decode through
  * `javax.imageio` must recover the source payload pixel-exactly
  * (PNG is lossless), and the decoded bytes must be genuine PNG. */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  test("PNG roundtrip recovers the payload bytes exactly") {
    val rows = Media.mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 20)
      .as[Media.MediaRow].collect()
    val encoded = Media.encodePng(rows.iterator).toSeq
    // real PNG magic on every encoded image
    encoded.foreach { e =>
      assert((e.png(0) & 0xff) === 0x89 && e.png(1) === 'P'.toByte
        && e.png(2) === 'N'.toByte && e.png(3) === 'G'.toByte)
    }
    // decode and compare raster against the source bytes
    encoded.zip(rows).foreach { case (e, src) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(e.png))
      assert(img.getWidth === 4 && img.getHeight === 4)
      val got = for (y <- 0 until 4; x <- 0 until 4)
        yield img.getRaster.getSample(x, y, 0)
      assert(got === src.content.map(_ & 0xff).toSeq)
    }
  }

  test("imageDecode features match a direct bytewise computation") {
    val feats = Media.imageDecode(spark, sfDir).collect()
    assert(feats.nonEmpty)
    val src = Media.mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 50)
      .as[Media.MediaRow].collect().map(r => r.id -> r.content).toMap
    feats.foreach { r =>
      val bytes = src(r.getAs[Long]("id")).map(_ & 0xff)
      val mean = math.round(bytes.sum.toDouble / 16 * 10000.0) / 10000.0
      assert(r.getAs[Double]("mean_pixel") === mean)
      assert(r.getAs[Int]("h0") === bytes.count(_ >> 6 == 0))
    }
  }

  test("JPEG fixture decodes through the same path and embeds") {
    val rows = Media.mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 20)
      .as[Media.MediaRow].collect()
    // real JFIF/SOI magic on every encoded image
    val jpegs = Media.encodeJpeg(rows.iterator).toSeq
    jpegs.foreach { j =>
      assert((j.png(0) & 0xff) === 0xff && (j.png(1) & 0xff) === 0xd8,
        "missing JPEG SOI marker")
    }
    // the SAME decode path that handles PNG sniffs and decodes JPEG
    val decoded = Media.decodeImage(jpegs.iterator).toSeq
    decoded.zip(rows).foreach { case (d, src) =>
      assert(d.width === 4 && d.height === 4)
      assert(d.h0 + d.h1 + d.h2 + d.h3 === 16)
      // lossy codec: mean survives within a loose DCT tolerance
      val srcMean = src.content.map(_ & 0xff).sum.toDouble / 16
      assert(math.abs(d.mean_pixel - srcMean) < 32.0,
        s"id ${d.id}: JPEG mean ${d.mean_pixel} vs source $srcMean")
    }
    // reference normalization: a PNG payload re-encodes to JPEG and
    // still decodes through the shared path
    val pngs = Media.encodePng(rows.iterator).toSeq
    val normalized = Media.reencodeJpeg(pngs.iterator).toSeq
    normalized.foreach(j =>
      assert((j.png(0) & 0xff) === 0xff && (j.png(1) & 0xff) === 0xd8))
    assert(Media.decodeImage(normalized.iterator).size === rows.length)
    // and the decoded-JPEG bytes flow through the visionEmbed chain:
    // 64 unit-norm dims per image, same as the PNG/raw path
    val fromJpeg = decoded.map { d =>
      (d.id, Array.fill(16)((d.mean_pixel / 255.0 * 127).toByte))
    }.toDF("id", "content")
    val emb = fromJpeg.select($"id",
      graft.functions.Embeddings.embedVision($"content").as("e"))
      .select($"id", size($"e").as("n"),
        round(aggregate($"e", lit(0.0d), (acc, v) => acc + v * v), 6)
          .as("norm2"))
      .collect()
    emb.foreach { r =>
      assert(r.getAs[Int]("n") === 64)
      assert(math.abs(r.getAs[Double]("norm2") - 1.0) < 1e-4)
    }
  }

  test("video payload is one real AVI binary cell per video") {
    import graft.ops.Avi
    val v = graft.ops.Video.videoTable(spark, sfDir)
      .select($"video_id", $"n_frames", $"content")
      .limit(100).collect()
    assert(v.nonEmpty)
    v.foreach { r =>
      val content = r.getAs[Array[Byte]]("content")
      // real RIFF/AVI magic, and the parsed container agrees with the
      // metadata column
      assert(new String(content.slice(0, 4), "US-ASCII") === "RIFF")
      assert(new String(content.slice(8, 12), "US-ASCII") === "AVI ")
      val av = Avi.read(content)
      assert(av.totalFrames === r.getAs[Int]("n_frames"))
      assert(av.frames.length === av.totalFrames)
      assert(av.width === 4 && av.height === 4)
      assert(av.handler === "MPNG")
    }
  }

  test("frame-stride sampling decodes the frames the stride dictates") {
    import graft.ops.{Avi, Video}
    // every sampled frame must DECODE (demux → PNG decode) back to
    // the md5 bytes it encodes, and per-bucket counts must be exactly
    // Σ ceil(n/4)
    val md = java.security.MessageDigest.getInstance("MD5")
    val one = Video.videoTable(spark, sfDir)
      .select($"video_id", $"n_frames", $"content").limit(5).collect()
    one.foreach { r =>
      val id = r.getAs[Long]("video_id")
      val av = Avi.read(r.getAs[Array[Byte]]("content"))
      (0 until r.getAs[Int]("n_frames") by Video.Stride).foreach { f =>
        val expect = md.digest(s"$id:$f".getBytes("UTF-8")).map(_ & 0xff)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(av.frames(f)))
        val got = (0 until 16).map(i =>
          img.getRaster.getSample(i % 4, i / 4, 0))
        assert(got == expect.toSeq, s"video $id frame $f")
      }
    }
    val buckets = Video.frameSample(spark, sfDir).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n_sampled")).toMap
    val expected = Video.videoTable(spark, sfDir)
      .select($"n_frames").collect().map(_.getInt(0))
      .groupBy(n => if (n < 16) "short" else if (n < 24) "medium" else "long")
      .map { case (b, ns) =>
        b -> ns.map(n => (n + Video.Stride - 1) / Video.Stride).map(_.toLong).sum
      }
    assert(buckets === expected)
  }

  test("area resize halves dims and block-averages the decoded raster") {
    val rows = Media.mediaTable(spark, sfDir)
      .filter(col("kind") === "image" && col("id") < 20)
      .as[Media.MediaRow].collect()
    val resized = Media.decodeResized(
      Media.resizeHalf(Media.encodePng(rows.iterator))).toSeq
    assert(resized.size === rows.length)
    (rows.sortBy(_.id) zip resized.sortBy(_.id)).foreach { case (r, z) =>
      assert(z.width === 2 && z.height === 2)
      val px = r.content.map(_ & 0xff)
      def block(rx: Int, ry: Int) =
        (px(2 * ry * 4 + 2 * rx) + px(2 * ry * 4 + 2 * rx + 1) +
          px((2 * ry + 1) * 4 + 2 * rx) + px((2 * ry + 1) * 4 + 2 * rx + 1)) / 4
      assert(Seq(z.p00, z.p01, z.p10, z.p11) ===
        Seq(block(0, 0), block(1, 0), block(0, 1), block(1, 1)),
        s"resize arithmetic drift for id=${r.id}")
    }
  }
}
