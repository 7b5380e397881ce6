package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-pinned loaders for the driver-generated fixture tables
  * (FIXTURES.md). Every entry point (SparkEntry/Verify/Bench/tests) reads
  * tables through here so session hazards are fixed in exactly one place:
  *
  *  - `events.ts` is parquet TIMESTAMP(NANOS): Spark 4 throws
  *    [PARQUET_TYPE_ILLEGAL] unless `spark.sql.legacy.parquet.nanosAsLong`
  *    is set, and then reads LongType nanoseconds. DuckDB reads the same
  *    column truncated to microsecond TIMESTAMP. We convert with integer
  *    division (`ts DIV 1000` — NOT float division, which loses precision
  *    above 2^53 ns) and cast to TIMESTAMP_NTZ under the UTC session so
  *    both engines see identical wall-clock microseconds. SURVEY §7.4.1.
  *  - session timezone pinned UTC for TimestampNTZ parity with DuckDB.
  */
object Tables {
  /** Runtime-settable session configs every entry point needs. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events with `ts` converted ns→µs TIMESTAMP_NTZ, exactly matching what
    * DuckDB reads from the same parquet (truncation, not rounding). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))

  /** events with the raw LongType nanosecond `ts` (for ops that want the
    * exact value, e.g. streaming tests that re-derive their own time). */
  def eventsRawNs(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
}
