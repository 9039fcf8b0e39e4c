package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-job breakdown of a named SparkEntry query (guide §1: decide
  * whether time goes to compute, shuffle, or driver-side gaps before
  * touching anything). Registers a listener that records every job's
  * wall time and call site, runs the query `reps` times, and prints
  * one line per job plus the gap (driver/plan/codegen) total.
  *
  * {{{ tools/run_graft.sh graft.tools.ProbeJobs /root/testdata/sf0.1 2 q239_tree_recall }}}
  */
object ProbeJobs {

  private final case class J(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        val stages = js.stageInfos.map(si =>
          si.name.takeWhile(_ != '\n').take(60)).mkString(" | ")
        jobs.put(js.jobId, J(js.jobId, s"$site  [$stages]", System.nanoTime(), 0L))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = System.nanoTime()
      }
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        jobs.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val t1 = System.nanoTime()
        val wall = (t1 - t0) / 1e9
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.id)
          .filter(j => j.end > 0 && j.start >= t0)
        val jobSum = js.map(j => (j.end - j.start) / 1e9).sum
        println(f"PROBE $name rep=$rep wall=$wall%.3f jobs=${js.size} " +
          f"jobSum=$jobSum%.3f gap=${wall - jobSum}%.3f rows=$n")
        js.foreach { j =>
          println(f"  job ${j.id}%3d ${(j.end - j.start) / 1e9}%7.3f s  ${j.desc}")
        }
        graft.GraftSession.scrub(spark)
      }
    }
    spark.stop()
  }
}
