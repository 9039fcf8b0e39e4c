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

  /** The EXACT conf set scoped around every stateful `start()` —
    * exposed for the no-leak spec (the AqeSkew discipline).
    *
    * Backend (r10, VERDICT r9 #6): RocksDB with CHANGELOG
    * checkpointing replaces the default HDFS-backed provider. A
    * commit then appends only the batch's changelog instead of
    * snapshotting the full store (snapshots move to background
    * maintenance), which is where the bounded replays' fixed cost
    * lives — probed idle at sf0.1, min-of-3 per backend
    * (tools/ProbeStateBackend): q157 6.52→5.03 s (−23%),
    * q162 5.42→5.34 s, q191 2.99→2.87 s; never slower on any
    * family member. At production scale the same choice is forced
    * by memory: HDFS-backed state lives entirely on the JVM heap,
    * RocksDB spills to executor-local disk. Answers are
    * backend-independent (RocksDbStateSpec pins parity; every
    * streaming query stays oracle-gated). */
  val ScopedConfs: Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> ReplayPartitions.toString,
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
      "true",
    // r16: RocksDB's row-count tracking issues one GET per PUT/DELETE
    // just to maintain the numRowsTotal progress metric — on the
    // stream-stream join (4 stores/partition, a put per input row)
    // that doubled per-batch state work (probed q210 jobSum
    // 9.8 → 2.7 s with the manager fix stacked). The metric is
    // observability-only; answers are unaffected. Production keeps it
    // off for the same reason unless the dashboard needs the count.
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" ->
      "false")

  def withStatePartitions[T](spark: SparkSession,
      n: Int = ReplayPartitions)(f: => T): T = {
    val confs = ScopedConfs.map {
      case ("spark.sql.shuffle.partitions", _) =>
        "spark.sql.shuffle.partitions" -> n.toString
      case kv => kv
    }
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      f
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
