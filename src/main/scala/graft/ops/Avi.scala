package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** RIFF/AVI container subset — the video half of the multimodal
  * codec triple (WAV: [[Audio]], WARC: [[Warc]], AVI: here). Writer
  * and reader for single-video-stream AVI files per the public
  * AVI RIFF form (Microsoft "AVI RIFF File Reference"): little-endian
  * chunks, word alignment, `hdrl` (avih + strl{strh,strf}) header
  * lists, a `movi` LIST of `00dc` compressed-frame chunks, and an
  * `idx1` index. Frame PAYLOADS are whole still-image codestreams —
  * the MJPEG family of AVI codecs (`MJPG` fourcc: one JPEG per
  * chunk; `MPNG`: one PNG per chunk), which is why this reuses the
  * existing per-frame image codec in [[Media]] instead of shipping
  * any new decode tech.
  *
  * Reference anchor: the vision ingest path
  * `/root/reference/backend/src/embeddings.py:18-43` (fetch → decode
  * → re-encode) generalized to per-frame decode over container bytes.
  *
  * Scale shape: a video is ONE binary cell; parse + per-frame decode
  * run inside `mapPartitions` with nothing on the driver, and only
  * SAMPLED frames are ever decoded ([[Video.frameSample]]).
  */
object Avi {

  /** Parsed container: declared header metadata + raw frame
    * codestreams in `movi` order (NOT decoded — decode is the
    * caller's per-frame step, applied only to sampled frames). */
  case class AviVideo(width: Int, height: Int, totalFrames: Int,
      microSecPerFrame: Int, handler: String, frames: Vector[Array[Byte]])

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt((v & 0xffffffffL).toInt).array()

  private def u16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort((v & 0xffff).toShort).array()

  /** One chunk: id + size + data + pad byte when size is odd (RIFF
    * word alignment — the detail naive writers get wrong). */
  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length + 9)
    bos.write(fourcc(id)); bos.write(u32(data.length)); bos.write(data)
    if ((data.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  private def list(listType: String, payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payload.length + 12)
    bos.write(fourcc("LIST")); bos.write(u32(payload.length + 4))
    bos.write(fourcc(listType)); bos.write(payload)
    bos.toByteArray
  }

  /** Serialize frames (each a complete still-image codestream from
    * [[Media.encodePng]]/[[Media.encodeJpeg]]) as a single-stream AVI.
    *
    * @param handler stream codec fourcc: "MPNG" (PNG frames,
    *   lossless) or "MJPG" (JPEG frames) — stored in both strh
    *   fccHandler and BITMAPINFOHEADER biCompression, where real
    *   players look it up.
    */
  def write(frames: Seq[Array[Byte]], width: Int, height: Int,
      handler: String, fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max
    val uspf = 1000000 / fps
    // avih: MainAVIHeader (56 bytes = 14 LE u32s)
    val avih = chunk("avih", Array.concat(
      u32(uspf), u32(maxFrame.toLong * fps), u32(0), u32(0x10 /*HASINDEX*/),
      u32(frames.length), u32(0), u32(1 /*streams*/), u32(maxFrame),
      u32(width), u32(height), u32(0), u32(0), u32(0), u32(0)))
    // strh: AVIStreamHeader for the single 'vids' stream
    val strh = chunk("strh", Array.concat(
      fourcc("vids"), fourcc(handler), u32(0), u16(0), u16(0), u32(0),
      u32(1 /*scale*/), u32(fps /*rate*/), u32(0), u32(frames.length),
      u32(maxFrame), u32(-1 /*quality: default*/), u32(0),
      u16(0), u16(0), u16(width), u16(height)))
    // strf: BITMAPINFOHEADER (biCompression = handler fourcc)
    val strf = chunk("strf", Array.concat(
      u32(40), u32(width), u32(height), u16(1), u16(24), fourcc(handler),
      u32(width.toLong * height * 3), u32(0), u32(0), u32(0), u32(0)))
    val hdrl = list("hdrl", Array.concat(avih, list("strl", strh ++ strf)))
    // movi: one '00dc' (stream 0, compressed video) chunk per frame,
    // recording offsets as we go for idx1 (offset of the chunk ID
    // relative to the 'movi' fourcc — the convention most demuxers
    // expect)
    val moviBody = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = moviBody.size() + 4
      moviBody.write(chunk("00dc", f)); off
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = chunk("idx1", Array.concat(
      frames.zip(offsets).map { case (f, off) =>
        Array.concat(fourcc("00dc"), u32(0x10 /*KEYFRAME*/),
          u32(off), u32(f.length))
      }: _*))
    val body = Array.concat(fourcc("AVI "), hdrl, movi, idx1)
    Array.concat(fourcc("RIFF"), u32(body.length), body)
  }

  private def readU32(b: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN)
      .getInt.toLong & 0xffffffffL

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parse a single-video-stream AVI produced by any conformant
    * muxer (not just [[write]]): walks the chunk tree by declared
    * sizes with word alignment, pulls dims/frame-count/rate from
    * `avih`, the codec fourcc from `strh`, and the VIDS STREAM's
    * `NNdc`/`NNdb` frame chunks from the `movi` LIST (nested `rec `
    * groups included) — NN is the stream's strl declaration index,
    * so an interleaved audio stream's chunks never leak into the
    * frame vector. Throws on structural corruption — truncated
    * chunks, missing magic, a second vids stream — rather than
    * guessing. */
  def read(bytes: Array[Byte]): AviVideo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF",
      "not a RIFF file")
    require(tag(bytes, 8) == "AVI ", s"not an AVI form: '${tag(bytes, 8)}'")
    val end = math.min(bytes.length.toLong, 8L + readU32(bytes, 4)).toInt

    var width = 0; var height = 0; var total = 0; var uspf = 0
    var handler = ""
    // streams are numbered by strl declaration order; frame chunks
    // carry their stream number in the id ('NNdc'), so only THE vids
    // stream's chunks are video frames — an audio or second stream
    // interleaved in movi must not leak into the frame vector
    var strhSeen = 0
    var vidsStream = -1
    val frames = Vector.newBuilder[Array[Byte]]

    // Iterate sibling chunks in [off, limit); recurse into LISTs.
    def walk(off0: Int, limit: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= limit) {
        val id = tag(bytes, off)
        val sz = readU32(bytes, off + 4).toInt
        val dataOff = off + 8
        require(dataOff + sz <= limit,
          s"chunk '$id' overruns its parent (size $sz at offset $off)")
        id match {
          case "LIST" =>
            val lt = tag(bytes, dataOff)
            walk(dataOff + 4, dataOff + sz,
              inMovi || lt == "movi" || lt == "rec ")
          case "avih" =>
            uspf = readU32(bytes, dataOff).toInt
            total = readU32(bytes, dataOff + 16).toInt
            width = readU32(bytes, dataOff + 32).toInt
            height = readU32(bytes, dataOff + 36).toInt
          case "strh" =>
            if (tag(bytes, dataOff) == "vids") {
              require(vidsStream < 0,
                "multiple 'vids' streams are not supported (one video " +
                  "stream per file in this subset — failing loudly " +
                  "rather than interleaving their frames)")
              vidsStream = strhSeen
              handler = tag(bytes, dataOff + 4)
            }
            strhSeen += 1
          case f if inMovi && f.length == 4 && f(0).isDigit &&
              f(1).isDigit && (f.substring(2) == "dc" || f.substring(2) == "db") =>
            val sn = (f(0) - '0') * 10 + (f(1) - '0')
            if (sn == vidsStream)
              frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + sz)
          case _ => () // idx1, strf, junk padding — skip
        }
        off = dataOff + sz + (sz & 1) // word alignment
      }
    }
    walk(12, end, inMovi = false)
    require(vidsStream >= 0, "AVI declares no 'vids' stream")
    val fs = frames.result()
    require(fs.nonEmpty, "AVI contains no video frame chunks")
    AviVideo(width, height, total, uspf, handler, fs)
  }
}
