package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet testdata (TESTDATA.md).
  *
  * All engine queries take `(SparkSession, sfDir)` and resolve tables
  * through here so the scan always goes through the columnar parquet
  * reader with pushdown/pruning intact (no caching layer in the way).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts has shipped in two physical layouts across testdata
    * generations: parquet INT64 TIMESTAMP(NANOS) — which Spark's vector
    * reader only surfaces as BIGINT under
    * `spark.sql.legacy.parquet.nanosAsLong=true` — and native
    * `timestamp[us]`, which Spark reads directly as a timestamp type.
    * The loader is an adapter over that boundary: it branches on the
    * column's resolved dtype so both layouts land on identical
    * microsecond timestamps (matching what DuckDB reads natively, so
    * the oracle sees the same values either way). */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = eventsRaw(s, d)
    raw.schema("ts").dataType match {
      case LongType =>        // legacy INT64-nanos layout via nanosAsLong
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // native timestamp[us]; align to TIMESTAMP
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw            // already TIMESTAMP — pass through
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
