package graft.streaming

import graft.ops.Warc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Streaming WARC ingest end-to-end: WARC container frames arrive as
  * a stream (the batch-scale form of the reference's per-fetch Celery
  * queue, SURVEY §2.I), each micro-batch walks the container records
  * scan-locally ([[Warc.responseItems]]), routes the HTTP responses
  * into page items, and the shared [[Ingest]] pipeline does the rest:
  * embed → normalize/truncate → url-keyed newest-wins upsert into the
  * parquet corpus. At-least-once delivery + the idempotent merge =
  * effectively exactly-once, exactly like the PageItem stream.
  *
  * Scale shape: the decode is mapPartitions inside the micro-batch
  * (one task per WARC frame slice — a 100 TB .warc.gz backlog is just
  * more frames through the same plan), and the only exchange per
  * batch is the upsert's merge-key shuffle. Nothing WARC-specific
  * touches the sink: the stream is indistinguishable from the live
  * crawler's once routed.
  */
object WarcIngest {

  /** Route a (streaming or batch) WARC-file frame set to page items.
    * Typed mapPartitions works identically on both execution modes. */
  def route(files: Dataset[Warc.WarcFile]): DataFrame =
    Warc.responseItems(files)

  /** Wire a streaming WARC source through route → embed → upsert.
    * Returns the StreamingQuery (caller manages lifecycle). */
  def run(spark: SparkSession, files: Dataset[Warc.WarcFile],
      corpusDir: String, checkpointDir: String) =
    Ingest.run(spark, route(files), corpusDir, checkpointDir)
}
