package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-partition sizing for the bounded streaming replays.
  *
  * A stateful streaming query materializes one state-store instance
  * per shuffle partition per stateful operator, and every micro-batch
  * commits every one of them (delta file + snapshot bookkeeping in
  * the checkpoint). The session default (≈ cores) is sized for BATCH
  * shuffles over sf-scale data; for the declared-query replays —
  * a handful of micro-batches over one table — 32 partitions mean
  * hundreds of store commits that are pure fixed overhead (the
  * busiest key-space here is thousands of keys, KBs of state).
  *
  * [[withStatePartitions]] scopes the shuffle-partition count down
  * for the lifetime of one streaming query (the count is captured at
  * query START and fixed for the checkpoint's life, so the scope only
  * needs to cover `start()`). At production rates the same knob turns
  * the other way — state partitions are sized to throughput × key
  * cardinality, independently of this code.
  *
  * Answers are unaffected: every streaming declared query is either
  * key-wise order-insensitive or pinned by staged-file order, and
  * state partitioning never changes WHAT is computed.
  */
object StreamTune {

  /** Shuffle/state partitions for bounded replays. */
  val ReplayPartitions = 8

  def withStatePartitions[T](spark: SparkSession,
      n: Int = ReplayPartitions)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
