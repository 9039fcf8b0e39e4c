package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: does a richer ENGINE warmup (broadcast join + window +
  * decimal agg over tiny data, in addition to the scan+shuffle one)
  * absorb the C2-compile surface that otherwise lands on an iterative
  * query's rep 1?
  *
  * {{{ sbt "runMain graft.tools.ProbeWarmup /root/testdata/sf0.1 q75_pagerank_full" }}}
  */
object ProbeWarmup {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    var j0 = jit.getTotalCompilationTime
    var t0 = System.nanoTime()
    // tier-1 warmup (current Bench warmup)
    graft.Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()
    println(f"[warm] scan+shuffle: ${(System.nanoTime() - t0) / 1e9}%.2fs jit=${jit.getTotalCompilationTime - j0}ms")
    // tier-2 warmup: a tiny synthetic ITERATIVE loop (join + decimal
    // agg + broadcast + per-iteration localCheckpoint over 25 rows) —
    // the Catalyst analysis/optimization/planning paths an iterative
    // query drives 13+ times are what C2 spends tens of seconds
    // compiling during q75's rep 1
    j0 = jit.getTotalCompilationTime
    t0 = System.nanoTime()
    val n = graft.Tables.nation(spark, sfDir)
    var it = n.select(col("n_nationkey").as("node"), lit(1.0).as("r"))
      .coalesce(1).localCheckpoint()
    val e = n.select(col("n_nationkey").as("src"),
      col("n_regionkey").as("dst"))
    for (_ <- 1 to 5) {
      it = e.join(broadcast(it), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(round(sum(col("r").cast("decimal(28,14)")).cast("double"), 12)
          .as("r"))
        .select(col("dst").as("node"), col("r"))
        .coalesce(1).localCheckpoint()
    }
    it.count()
    println(f"[warm] iterative-loop: ${(System.nanoTime() - t0) / 1e9}%.2fs jit=${jit.getTotalCompilationTime - j0}ms")
    // JIT drain
    var last = jit.getTotalCompilationTime
    var stable = 0
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (stable < 3 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      val now = jit.getTotalCompilationTime
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
    println(s"[warm] drained to jit=${jit.getTotalCompilationTime}ms total")
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val jq = jit.getTotalCompilationTime
      val tq = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - tq) / 1e9
      println(f"[probe] $name rep $i: $dt%.2fs jit=${jit.getTotalCompilationTime - jq}ms rows=$rows")
      graft.GraftSession.scrub(spark)
    }
    spark.stop()
  }
}
