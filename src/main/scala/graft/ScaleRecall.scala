package graft

import org.apache.spark.sql.SparkSession

/** Measured-recall harness for the approximate record-linkage plan:
  * runs the EXACT quadratic fn_jaro top-100 (the ground truth — this is
  * a measurement tool, so re-importing its Σ block² cost once is the
  * point, not a defect) and the linear fn_jaro_snm top-100 on the same
  * dataset dir, and prints recall = |snm ∩ exact| / |exact| as one JSON
  * line. Used to record the recall/runtime tradeoff AT THE SCALE THE
  * LINEAR VARIANT IS SOLD FOR (sf1 via ScaleGen) — fixture-scale recall
  * lives in PrefixJoinSpec; BASELINE.md carries the sf1 row.
  *
  * Usage: runMain graft.ScaleRecall <dataDir>
  */
object ScaleRecall {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Custom.register(spark)

    def pairs(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    def recallOf(exact: Set[(Long, Long)], cand: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0 else (exact & cand).size.toDouble / exact.size

    import graft.operators.Insights
    // raw = the declared keys verbatim. Under ScaleGen's verbatim-copied
    // names the raw exact top-100 saturates with ONE exact-duplicate
    // clique's id-ordered jw=1.0 pairs at high replication (sf10: 100
    // copies/name), so raw recall measures the id tiebreaker, not the
    // matcher — see the BASELINE.md sf10 adjudication. near = both plans
    // restricted to name_a ≠ name_b, the pairs SNM exists to find
    // (production collapses exact duplicates FIRST — llm_dedup_exact /
    // the llm_ingest_e2e funnel's stage 1).
    val (exact, tExact) = pairs(Insights.jaroExactTop(spark, dir))
    val (snm, tSnm) = pairs(Insights.snmTop(spark, dir))
    val (exactNear, tExactN) = pairs(Insights.jaroExactTop(spark, dir, excludeEqual = true))
    val (snmNear, tSnmN) = pairs(Insights.snmTop(spark, dir, excludeEqual = true))
    println(f"""{"metric":"snm_recall","dir":"$dir","recall":${recallOf(exact, snm)}%.4f,"recall_near":${recallOf(exactNear, snmNear)}%.4f,"n_exact":${exact.size},"n_snm":${snm.size},"n_exact_near":${exactNear.size},"n_snm_near":${snmNear.size},"t_exact_s":$tExact%.2f,"t_snm_s":$tSnm%.2f,"t_exact_near_s":$tExactN%.2f,"t_snm_near_s":$tSnmN%.2f}""")
    spark.stop()
  }
}
