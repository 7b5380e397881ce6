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
  *  - never DECLARE a decimal output column: the driver reads Spark's
  *    parquet via pandas (decimal → Python Decimal object, '2.5000') but
  *    the DuckDB oracle via .df() (decimal → float64, 2.5) — the same
  *    value hash-mismatches on representation (all 15 round-1 hash-fails).
  *    So: exact decimal arithmetic INSIDE the query, one deterministic
  *    cast to DOUBLE as the very last step on BOTH sides. A scale-4
  *    decimal whose unscaled value fits a long converts to double as the
  *    same correctly-rounded `unscaled / 10⁴` division in the JVM
  *    (BigDecimal.doubleValue compact path) and DuckDB (hugeint→double
  *    then /10⁴) — bit-identical;
  *  - every declared query ends in a total order with a unique tiebreaker.
  */
object H {
  val D: DecimalType = DecimalType(38, 4)

  /** Exact, order-independent sum of a double expression, emitted as
    * DOUBLE. Oracle twin: [[oSum]]. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Deterministic average: exact decimal sum divided by count, rounded
    * once to scale 4, then emitted as DOUBLE. Oracle twin: [[oAvg]]. */
  def davg(c: Column): Column = (sum(c.cast(D)) / count(c)).cast(D).cast("double")

  /** Oracle-side spelling of dsum/davg. */
  def oSum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(38,4))) AS DOUBLE)"
  def oAvg(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(38,4))) / COUNT($x) AS DECIMAL(38,4)) AS DOUBLE)"

  /** In-row canonical pair explosion over a SORTED DISTINCT array column:
    * every (a, b) with a before b, as structs. The 1-based slice start
    * (i + 2) against transform's 0-based index i is the load-bearing
    * subtlety — shared by basket pairs, audience overlap, and the
    * co-supply edge builders so an off-by-one can only ever be fixed in
    * one place. This is the join-free alternative to a groupwise
    * self-join: Σ C(k,2) pairs materialize in-row off one reduced array,
    * never Σ k² join probes. */
  def pairsE(arr: String): String =
    s"""flatten(transform($arr, (a, i) ->
         transform(slice($arr, i + 2, size($arr)), b -> struct(a, b))))"""
}
