package graft.tools
object CalibCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.calibrate(spark) // warm
    val v = (1 to 3).map(_ => graft.Bench.calibrate(spark))
    println(f"CALIB tri=${v.min}%.3f/${v.sorted.apply(1)}%.3f/${v.max}%.3f load=${graft.Bench.loadAvg()}%.2f")
    spark.stop()
  }
}
