package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.operators / graft.sources / graft.functions and
  * are assembled by [[Registry]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_pipeline_e2e = the reference's whole ingest workflow (validate →
    * null-clean → registry lookup → unregistered check → report) in one
    * declarative plan. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_pipeline_e2e").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map { case (k, q) => k -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case (k, Q(_, Some(o))) => k -> o }.toMap
}
