package graft

import graft.ops.{Media, Phash}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-dup census (q167): from-scratch driver
  * replay (independent md5 byte math + naive all-pairs), the
  * codec-roundtrip pin (hash from decoded PNG ≡ hash from source
  * bytes), and the banding pigeonhole guarantee on adversarial
  * hashes.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def md5bytes(s: String): Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map(_ & 0xff)
  }

  private def replay(): Seq[(Long, Long, Long)] = {
    val parts = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_name")
      .as[(Long, String)].collect().toSeq
    val base = parts.collect {
      case (id, name) if id % 3 != 0 => (id, md5bytes(name))
    }
    val all = base.flatMap { case (id, px) =>
      if (id % Phash.CopyEvery == 0) {
        val p2 = px.clone()
        val pos = ((id / Phash.CopyEvery) % 16).toInt
        p2(pos) = math.min(p2(pos) + Phash.Delta, 255)
        Seq((id, px), (id + Phash.CopyIdOffset, p2))
      } else Seq((id, px))
    }
    val hs = all.map { case (id, px) => (id, Phash.hash48(px)) }
    val pairs = for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= Phash.MaxHamming
    } yield (d.toLong, if (ib - ia == Phash.CopyIdOffset) 1L else 0L)
    pairs.groupBy(_._1).map { case (d, ps) =>
      (d, ps.size.toLong, ps.map(_._2).sum)
    }.toSeq.sortBy(_._1)
  }

  test("q167 equals a from-scratch naive all-pairs replay") {
    val got = Phash.imageNearDup(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === replay())
    assert(got.nonEmpty)
    assert(got.map(_._3).sum > 0, "planted copies must be detected")
  }

  test("hash from the decoded PNG equals hash from the source bytes") {
    val rows = Media.mediaTable(spark, sfDir)
      .filter($"kind" === "image").limit(20)
      .as[Media.MediaRow].collect()
    rows.foreach { r =>
      val direct = Phash.hash48(r.content.map(_ & 0xff))
      val viaCodec = Phash.decodeAndHash(
        Media.encodePng(Iterator.single(r))).next()._2
      assert(direct === viaCodec, s"codec roundtrip drift for id=${r.id}")
    }
  }

  test("pigeonhole: banding captures every pair within MaxHamming") {
    // adversarial: flip exactly MaxHamming bits spread across
    // different bands — a 7th band must remain identical
    val rng = new scala.util.Random(11)
    val bases = Seq.fill(50)(rng.nextLong() & ((1L << 48) - 1))
    val flipped = bases.map { h =>
      val bits = rng.shuffle((0 until 48).toList).take(Phash.MaxHamming)
      bits.foldLeft(h)((acc, b) => acc ^ (1L << b))
    }
    (bases zip flipped).foreach { case (a, b) =>
      val shared = (0 until Phash.Bands).exists { band =>
        ((a >> (8 * band)) & 255L) == ((b >> (8 * band)) & 255L)
      }
      assert(shared, f"pair ($a%x, $b%x) shares no band")
    }
  }
}
