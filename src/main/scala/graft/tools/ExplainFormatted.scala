package graft.tools

/** Write `.explain("formatted")` output for named SparkEntry queries
  * to files — the plan evidence the optimization rounds commit under
  * plans/rNN/.
  *
  * {{{ tools/run_graft.sh graft.tools.ExplainFormatted /root/testdata/sf0.1 plans/r15 before q79_ivf_1024 ... }}}
  */
object ExplainFormatted {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    new java.io.File(outDir).mkdirs()
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val short = name.takeWhile(_ != '_')
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${short}_$suffix.txt"), plan)
        println(s"wrote $outDir/${short}_$suffix.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"$name EXPLAIN_FAILED: ${e.getMessage}")
      } finally graft.GraftSession.scrub(spark)
    }
    spark.stop()
  }
}
