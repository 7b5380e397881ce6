package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator: a DataFrame builder plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against. */
case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String] = None)

/** Hash-stability helpers (SURVEY §7.4). The driver's correctness gate is a
  * bit-exact hash compare against DuckDB, so:
  *  - never emit a raw double aggregate (parallel double sums are
  *    order-dependent and AQE changes partial-agg order run-to-run):
  *    sum in DECIMAL(38,4) — exact, associative, deterministic;
  *  - every declared query ends in a total order with a unique tiebreaker.
  */
object H {
  val D: DecimalType = DecimalType(38, 4)

  /** Exact, order-independent sum of a double expression. Oracle twin:
    * SUM(CAST(x AS DECIMAL(38,4))). */
  def dsum(c: Column): Column = sum(c.cast(D))

  /** Deterministic average: exact decimal sum divided by count, rounded
    * once at the end. Oracle twin:
    * CAST(SUM(CAST(x AS DECIMAL(38,4))) / COUNT(x) AS DECIMAL(38,4)). */
  def davg(c: Column): Column = (sum(c.cast(D)) / count(c)).cast(D)

  /** Oracle-side spelling of dsum/davg. */
  def oSum(x: String): String = s"SUM(CAST($x AS DECIMAL(38,4)))"
  def oAvg(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(38,4))) / COUNT($x) AS DECIMAL(38,4))"
}
