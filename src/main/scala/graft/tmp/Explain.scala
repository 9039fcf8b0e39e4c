package graft.tmp
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    def ex(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    ex("q2_revenue_by_nation", graft.ops.Relational.revenueByNation(spark, sf))
    ex("q3_top_orders", graft.ops.Relational.topOrdersByRevenue(spark, sf))
    ex("q10_semantic_search", graft.ops.Search.semanticSearch(spark, sf))
    spark.stop()
  }
}
