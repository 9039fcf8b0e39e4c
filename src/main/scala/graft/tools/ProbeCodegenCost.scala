package graft.tools

/** Dev probe: time a named query fresh-JVM-style under SQL-conf
  * variants (whole-stage codegen on/off, codegen factory mode), with
  * per-run JIT/GC deltas — quantifies how much of an iterative
  * query's wall is compile surface vs execution.
  *
  * {{{ sbt "runMain graft.tools.ProbeCodegenCost /root/testdata/sf0.1 q75_pagerank_full wholeStage=false" }}}
  */
object ProbeCodegenCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      val full = k match {
        case "wholeStage" => "spark.sql.codegen.wholeStage"
        case "factoryMode" => "spark.sql.codegen.factoryMode"
        case "hugeMethodLimit" => "spark.sql.codegen.hugeMethodLimit"
        case other => other
      }
      full -> v
    }
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    val fn = graft.SparkEntry.queries(name)
    (1 to 3).foreach { i =>
      val j0 = jit.getTotalCompilationTime
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name rep $i: $dt%.2fs jit=${jit.getTotalCompilationTime - j0}ms rows=$n confs=${confs.mkString(",")}")
      graft.GraftSession.scrub(spark)
    }
    spark.stop()
  }
}
