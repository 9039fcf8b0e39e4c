package graft.tools

/** Dev utility: time named queries under FULL materialization — a
  * checksum over every output column — instead of the bench's
  * `count()` consumption. For aggregation/join-shaped queries the two
  * are equivalent, but for pure-projection transforms (q31, q59,
  * q227) `count()` lets Catalyst prune the computed columns away and
  * measures only the scan; this consumer forces every byte of the
  * transform, so scale probes of projection queries measure the work
  * a real writer would pay.
  *
  * {{{ sbt "runMain graft.tools.ProbeMaterialize /dev/shm/graft-x30 2 q227_span_corruption" }}}
  */
object ProbeMaterialize {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()
    names.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val row = graft.SparkEntry.queries(name)(spark, sfDir)
          .selectExpr("bit_xor(xxhash64(struct(*))) AS cks", "count(1) AS n")
          .collect()(0)
        val dt = (System.nanoTime() - t0) / 1e9
        graft.GraftSession.scrub(spark)
        println(f"[mat] $name rep $r: $dt%.3f s " +
          s"(${row.getAs[Long]("n")} rows, checksum ${row.get(0)})")
      }
    }
    spark.stop()
  }
}
