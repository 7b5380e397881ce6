package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared keys — the optimization
  * rounds' evidence artifact (plans/rNN/<key>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [key,key,...]
  * (no keys = every declared key). The session mirrors Bench's config so
  * the dumped plan is the one the bench times (same shuffle partitions,
  * same master width from SPARK_GRAFT_CPUS).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    sys.props("graft.fixtures.sf") = sfDir
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    val keys: Seq[String] =
      if (args.length > 3) args(3).split(",").toSeq
      else Registry.all.map(_._1)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      Registry.byName.get(k) match {
        case Some(q) =>
          try {
            val df = q.fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${k}_$suffix.txt"), txt)
            System.err.println(s"[plandump] wrote $k")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $k FAILED: ${e.getMessage}")
          }
        case None => System.err.println(s"[plandump] unknown key: $k")
      }
    }
    spark.stop()
  }
}
