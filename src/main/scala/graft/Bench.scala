package graft

/** Driver-run benchmark: every registered query at the given SF,
  * one JSON line on stdout. A small warm-up action runs first so
  * JVM/classloader startup isn't attributed to whichever query
  * happens to run first; per-query expression compilation stays in
  * the measurement (it's part of the engine's real cost).
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 2) and the
  * MINIMUM elapsed time is reported — one contended scheduling window
  * on a shared machine can't poison the record (the round-2 driver
  * bench recorded 3× the re-measured time for the heaviest queries
  * purely from machine contention).
  *
  * A query that throws is reported with its elapsed-until-failure
  * time AND listed in the `failed` array, so a crash can never
  * masquerade as a fast run. Times are rounded to milliseconds and
  * query keys shortened to their `qNN` prefix to keep the record
  * line small: the driver's output capture holds only the last ~2 KB
  * and the round-3 line with 79 full names overflowed it, leaving an
  * unparseable record ("parsed": null in BENCH_r03.json).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = GraftSession.builder(cpus).getOrCreate()
    // ERROR, not WARN: per-task log lines go driver-stderr → the
    // harness's capture file; when the host disk stalls (burst-credit
    // collapse, measured 3.5 MB/s windows) synchronous log appends
    // backpressure the executors themselves. The bench record is the
    // one stdout JSON line; progress lines below are one per rep.
    spark.sparkContext.setLogLevel("ERROR")

    // warm-up: exercise scan + shuffle + codegen machinery once
    Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()

    def ms3(v: Double): Double = math.rint(v * 1000) / 1000

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
          finally GraftSession.scrub(spark) // caches/checkpoints don't leak across queries
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%s ${ms3(dt)}%.3f ok=$ok%b")
        (dt, ok)
      }
      (name, ms3(runs.map(_._1).min), runs.forall(_._2))
    }
    def short(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, v, _) => s"\"" + short(k) + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + short(k) + "\"" }
      .mkString("[", ",", "]")
    val total = ms3(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
