package graft.sources

import graft.{Registry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** DataSourceV2 fixed-width reader: pushdown reaching the custom scan,
  * pruning behavior, and agreement with the compose-built-ins twin. */
class FixedWidthSpec extends SparkSuite {

  private def fixture(): String = {
    val out = s"${graft.Fixtures.dir}/customer_fixed_width"
    Tables.customer(spark, sf)
      .select(format_string("%10d%-12s%12.2f",
                col("c_custkey"), col("c_mktsegment"), col("c_acctbal")).as("value"))
      .write.mode("overwrite").text(out)
    out
  }

  private val layout =
    "c_custkey:1:10:long,c_mktsegment:11:12:string,bal:23:12:double"

  test("src_fixed_width_pushdown: GreaterThan and pruning reach the custom scan") {
    val df = Registry.byName("src_fixed_width_pushdown").fn(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("FixedWidthScan"), s"custom scan missing from plan:\n$p")
    assert(p.contains("GreaterThan(bal,5000.0)"),
      s"filter not pushed into the fixed-width scan:\n$p")
    assert(p.contains("fields=[c_custkey,bal]"),
      s"column pruning did not reach the scan (segment should be dropped):\n$p")
  }

  test("V2 reader agrees with the built-in text+substring twin") {
    val dir = fixture()
    val v2 = spark.read.format("graft.sources.FixedWidthSource")
      .option("layout", layout).load(dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("bal"))
    val twin = spark.read.text(dir)
      .select(substring(col("value"), 1, 10).cast("long").as("c_custkey"),
              trim(substring(col("value"), 11, 12)).as("c_mktsegment"),
              substring(col("value"), 23, 12).cast("double").as("bal"))
    assertSameRows(v2, twin)
    assert(v2.count() == Tables.customer(spark, sf).count())
  }

  test("count-only scan (zero projected columns) still counts every line") {
    val dir = fixture()
    val n = spark.read.format("graft.sources.FixedWidthSource")
      .option("layout", layout).load(dir).count()
    assert(n == Tables.customer(spark, sf).count())
  }

  test("pushed filter semantics match post-scan filtering") {
    val dir = fixture()
    val read = () => spark.read.format("graft.sources.FixedWidthSource")
      .option("layout", layout).load(dir)
    val pushedDown = read().filter(col("bal") > 0.0).count()
    val reference = read().collect().count(_.getDouble(2) > 0.0)
    assert(pushedDown == reference)
  }
}
