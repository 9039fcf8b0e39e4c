package graft.tools

import graft.GraftSession

/** Dev probe (VERDICT r9 #6): cost of the declared stateful streaming
  * replays under each state-store backend —
  *
  *   hdfs        — HDFSBackedStateStoreProvider (engine default; full
  *                 in-memory maps, per-batch delta files)
  *   rocks       — RocksDBStateStoreProvider, full snapshot uploads
  *   rocks+log   — RocksDB + changelog checkpointing (commit = append
  *                 the batch's changelog, snapshot in background)
  *
  * Prints one line per (backend, query, rep). The provider class is
  * captured at query START, so scoping the conf around the query fn
  * covers the whole replay; every replay stages a fresh checkpoint
  * (Scratch dirs are wiped at staging), so backends never mix within
  * a checkpoint's life.
  *
  * {{{ sbt "runMain graft.tools.ProbeStateBackend /root/testdata/sf0.1 3" }}}
  */
object ProbeStateBackend {

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ChangelogConf =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq(
      "q157_streaming_lsh", "q162_streaming_join", "q191_streaming_dedup"))
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val backends = Seq(
      "hdfs" -> Seq(),
      "rocks" -> Seq(ProviderConf -> RocksDb, ChangelogConf -> "false"),
      "rocks+log" -> Seq(ProviderConf -> RocksDb, ChangelogConf -> "true"))
    for ((label, confs) <- backends; name <- names) {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        (1 to reps).foreach { r =>
          val t0 = System.nanoTime()
          val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"PROBE $label%-9s $name rep$r ${dt}%.2fs rows=$n")
        }
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
