package graft.tools

/** Dev utility: print the executed plan of named SparkEntry queries.
  *
  * {{{ sbt "runMain graft.tools.ExplainQuery /root/testdata/sf0.01 q27_embedding_near_dup" }}}
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.lift(1).contains("all")) graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        println(s"===== $name =====")
        println(df.queryExecution.executedPlan.toString.take(400000))
      } catch { case e: Throwable =>
        println(s"===== $name ===== EXPLAIN_FAILED: ${e.getMessage}")
      } finally graft.GraftSession.scrub(spark)
    }
    spark.stop()
  }
}
