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

    def pairs(key: String): (Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = Registry.byName(key).fn(spark, dir)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val (exact, tExact) = pairs("fn_jaro")
    val (snm, tSnm) = pairs("fn_jaro_snm")
    val recall =
      if (exact.isEmpty) 1.0 else (exact & snm).size.toDouble / exact.size
    println(f"""{"metric":"snm_recall","dir":"$dir","recall":$recall%.4f,"n_exact":${exact.size},"n_snm":${snm.size},"t_exact_s":$tExact%.2f,"t_snm_s":$tSnm%.2f}""")
    spark.stop()
  }
}
