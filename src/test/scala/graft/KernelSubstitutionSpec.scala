package graft

import graft.plans.KernelSubstitution
import org.apache.spark.sql.functions._

/** The declarative-in/kernel-out contract: the optimizer rewrites the
  * `aggregate(zip_with(...))` dot-product fold to the codegen `vec_dot`
  * kernel, bit-identically. */
class KernelSubstitutionSpec extends SparkSuite {
  import spark.implicits._

  private val foldSql =
    """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""

  // Parquet-backed, NOT literal rows: ConvertToLocalRelation would
  // constant-fold a literal projection before user rules ever run.
  private def vectors =
    Tables.embeddings(spark, sf)
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))

  test("rule rewrites the fold to vec_dot and preserves bits") {
    val df = vectors
    val baseline = df.selectExpr(s"$foldSql AS dot").as[Double].collect()

    KernelSubstitution.install(spark)
    try {
      val rewritten = df.selectExpr(s"$foldSql AS dot")
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("vec_dot"), s"kernel not substituted:\n$plan")
      val out = rewritten.as[Double].collect()
      out.zip(baseline).foreach { case (k, f) =>
        assert(java.lang.Double.doubleToLongBits(k) ==
               java.lang.Double.doubleToLongBits(f), s"bit drift: $k vs $f")
      }
    } finally {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == KernelSubstitution)
    }
  }

  test("rule leaves non-matching folds alone") {
    KernelSubstitution.install(spark)
    try {
      // sum-of-squares over ints — different shape, must not rewrite
      val df = Seq((Array(1, 2, 3), Array(4, 5, 6))).toDF("p", "q")
      val kept = df.selectExpr(
        "aggregate(zip_with(p, q, (x, y) -> x + y), 0, (acc, v) -> acc + v) AS s")
      assert(!kept.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      assert(kept.as[Int].collect().sameElements(Array(21)))
    } finally {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations.filterNot(_ == KernelSubstitution)
    }
  }
}
