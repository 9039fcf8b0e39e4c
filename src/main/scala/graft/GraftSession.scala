package graft

import org.apache.spark.sql.SparkSession

/** One place for the session config the engine's entry points share:
  * UTC timezone (deterministic timestamps vs the oracle),
  * shuffle partitions ≈ cores (not the 200 default),
  * nanos-as-long parquet reads (the events table is TIMESTAMP(NANOS),
  * which Spark's vectorized reader otherwise refuses), AQE on for the
  * runtime re-planning story at scale.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
}
