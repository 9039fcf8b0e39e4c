package graft.tools

import graft.{Corpus, Tables}
import graft.functions.{Embeddings, VectorOps}
import org.apache.spark.sql.functions._

/** Dev probe: the driver's sf parquet tables are SINGLE files below
  * `spark.sql.files.maxPartitionBytes`, so a scan-fused expensive
  * projection (the 1024-d featurize) runs ONE-wide. Measures the
  * as-is shape against a repartition-before-featurize shape.
  *
  * {{{ sbt "runMain graft.tools.ProbeStageWidth /root/testdata/sf0.1 2" }}}
  */
object ProbeStageWidth {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = (1 to reps).foreach { rep =>
      val t0 = System.nanoTime()
      body
      println(f"PROBE_WIDTH $tag rep=$rep sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      graft.GraftSession.scrub(spark)
    }
    time("fused_1wide") {
      Corpus.docEmbeddings(spark, sfDir)
        .agg(sum(round(VectorOps.dot(col("v"), col("v")), 6))).head()
    }
    time("repart_32wide") {
      Tables.documents(spark, sfDir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id").as("vec_id"),
          VectorOps.truncateKnown(
            Embeddings.featurize(col("text"), Embeddings.ModelDims),
            Embeddings.RefDims).as("v"))
        .agg(sum(round(VectorOps.dot(col("v"), col("v")), 6))).head()
    }
    spark.stop()
  }
}
