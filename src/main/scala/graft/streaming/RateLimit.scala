package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
}
