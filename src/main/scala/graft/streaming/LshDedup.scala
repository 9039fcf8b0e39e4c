package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.Dataset
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
}
