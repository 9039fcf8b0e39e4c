package graft

import graft.ops.{Avi, Media, Scenes}
import org.apache.spark.sql.functions._

/** Scene-cut detection (q175): codec-roundtrip pin (decoded rasters
  * equal the synthesis math after mux→demux→decode), detector
  * boundary exactness (SAD == threshold is NOT a cut), and planted
  * truth recall.
  */
class ScenesSpec extends SparkSpec {
  import spark.implicits._

  test("AVI roundtrip preserves frame order and pixels") {
    val id = 77L; val n = 14; val len = 4
    val frames = (0 until n).map(i => Media.pngBytes(Scenes.sceneFrame(id, i, len)))
    val av = Avi.read(Avi.write(frames, 4, 4, "MPNG"))
    assert(av.totalFrames == n)
    (0 until n).foreach { i =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(av.frames(i)))
      val want = Scenes.sceneFrame(id, i, len).map(_ & 0xff)
      val got = for (y <- 0 until 4; x <- 0 until 4)
        yield img.getRaster.getSample(x, y, 0)
      assert(got.toSeq === want.toSeq, s"frame $i raster drifted")
    }
  }

  test("within-scene jitter is small; cuts are large") {
    val id = 12L; val len = 5
    val f = (0 until 10).map(i => Scenes.sceneFrame(id, i, len).map(_ & 0xff))
    def sad(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map(p => math.abs(p._1 - p._2)).sum
    // adjacent within scene 0: only byte 0 moves by exactly 1
    (1 until len).foreach(i => assert(sad(f(i - 1), f(i)) == 1))
    // the boundary pair jumps to fresh md5 noise
    assert(sad(f(len - 1), f(len)) > Scenes.SadThreshold)
  }

  test("q175 truth columns: every planted cut detected at sf0.001") {
    val rows = Scenes.sceneCuts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("detected_cuts") == r.getAs[Long]("true_cuts"))
      assert(r.getAs[Long]("matched_cuts") == r.getAs[Long]("true_cuts"))
      assert(r.getAs[Double]("mean_cut_mad") > 16.0)
      assert(r.getAs[Double]("mean_scene_mad") < 1.0)
    }
  }
}
