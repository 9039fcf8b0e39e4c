package graft

/** Driver-run benchmark: every registered query once at the given SF,
  * one JSON line on stdout. A small warm-up action runs first so
  * JVM/classloader startup isn't attributed to whichever query
  * happens to run first; per-query expression compilation stays in
  * the measurement (it's part of the engine's real cost).
  *
  * A query that throws is reported with its elapsed-until-failure
  * time AND listed in the `failed` array, so a crash can never
  * masquerade as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: exercise scan + shuffle + codegen machinery once
    Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
        finally spark.catalog.clearCache() // caches don't leak across queries
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
