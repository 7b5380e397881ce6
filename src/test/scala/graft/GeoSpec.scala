package graft

import org.apache.spark.sql.functions._

/** Geo family: plan shape (the whole point of the cell mechanism is the
  * equi-join plan) plus grid-candidate losslessness vs the naive
  * theta-join at fixture scale. */
class GeoSpec extends SparkSuite {

  test("q_join_geo: cell mechanism plans an equi-join, never a cartesian") {
    val p = Registry.byName("q_join_geo").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"radius join degenerated to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on cell keys:\n$p")
  }

  test("q_geo_nearest: same candidate plan + single window pass") {
    val p = Registry.byName("q_geo_nearest").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"NN join degenerated to all-pairs:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"expected the top-1 window:\n$p")
  }

  test("q_geo_cell_stats: map-side partial aggregation") {
    val p = Registry.byName("q_geo_cell_stats").fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"no partial agg:\n$p")
  }

  test("grid candidates are lossless vs the naive theta-join") {
    // The 3x3 neighbor block must contain every distance-R pair: compare
    // the declared radius join against the naive filtered cross product
    // on the fixture (150 x 10 pairs - trivially safe at test scale).
    val grid = Registry.byName("q_join_geo").fn(spark, sf)
    val c = Tables.customer(spark, sf).select(
      col("c_custkey"),
      (lit(-60.0) + (col("c_custkey") * 7919 % 12000) / 100.0).as("clat"),
      (lit(-180.0) + (col("c_custkey") * 104729 % 36000) / 100.0).as("clon"))
    val s = Tables.supplier(spark, sf).select(
      col("s_suppkey"),
      (lit(-60.0) + (col("s_suppkey") * 6271 % 12000) / 100.0).as("slat"),
      (lit(-180.0) + (col("s_suppkey") * 94907 % 36000) / 100.0).as("slon"))
    val d2 = (col("clat") - col("slat")) * (col("clat") - col("slat")) +
             (col("clon") - col("slon")) * (col("clon") - col("slon"))
    val naive = c.crossJoin(s)
      .select(col("c_custkey"), col("s_suppkey"), d2.as("d2"))
      .filter(col("d2") <= 25.0)
    assertSameRows(grid, naive)
    assert(grid.count() > 0, "fixture produced an empty radius join")
  }
}
