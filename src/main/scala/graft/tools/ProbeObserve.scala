package graft.tools

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Dev probe: does an [[Observation]] attached below an EAGER
  * localCheckpoint fire its metrics from the checkpoint job itself
  * (no extra count job)?  Decides the q229 adaptiveDocK shave
  * (r13 VERDICT #3): ride the corpus count on the materialization
  * vs keep the separate cached-blocks count().
  */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val obs = Observation("n")
    val df = (0 until 1000).toDF("x")
      .observe(obs, count(lit(1)).as("cnt"))
      .localCheckpoint()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got = scala.util.Try(
      Await.result(Future(obs.get), 5.seconds))
    println(s"metrics after localCheckpoint alone: $got")
    if (got.isFailure) {
      df.count()
      println(s"metrics after explicit count: ${scala.util.Try(
        Await.result(Future(obs.get), 5.seconds))}")
    }
    spark.stop()
  }
}
