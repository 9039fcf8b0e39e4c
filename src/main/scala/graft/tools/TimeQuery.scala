package graft.tools


/** Dev utility: time named SparkEntry queries at a given SF.
  *
  * {{{ sbt "runMain graft.tools.TimeQuery /root/testdata/sf0.1 q31_featurized q4_paginate_orders" }}}
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.GraftSession.scrub(spark)
      println(f"$name%-28s $dt%8.2f s  ($n rows)")
    }
    spark.stop()
  }
}
