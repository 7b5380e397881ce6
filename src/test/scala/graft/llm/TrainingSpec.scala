package graft.llm

import graft.{Registry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the distributed-training operators that the DuckDB
  * hash gate can't express: optimization behavior (loss descent) and
  * information-theoretic bounds (KL non-negativity), each recomputed
  * independently of the declared query where possible. */
class TrainingSpec extends SparkSuite {

  test("llm_logreg_train: 3 rounds, loss non-increasing, round-1 update " +
       "matches the closed form at w=0") {
    val rows = Registry.byName("llm_logreg_train").fn(spark, sf)
      .orderBy(col("iter")).collect()
    assert(rows.length == 3)
    val losses = rows.map(_.getDouble(5))
    assert(losses(0) >= losses(1) && losses(1) >= losses(2),
      s"GD loss must descend: ${losses.toSeq}")
    // At w = 0 every prediction is exactly 0.5, so the round-1 bias
    // weight has the closed form -0.5 * round(mean(0.5 - y), 6) —
    // recompute it straight off the fixture.
    val agg = Tables.documents(spark, sf)
      .agg(count(lit(1)).as("n"),
           sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"))
      .head()
    val (n, pos) = (agg.getLong(0), agg.getLong(1))
    val gb = BigDecimal((0.5 * n - pos) / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expectedWb = -0.5 * gb
    assert(math.abs(rows(0).getDouble(4) - expectedWb) < 1e-9,
      s"round-1 bias ${rows(0).getDouble(4)} != closed form $expectedWb")
    // And at w = 0 the loss is exactly -ln(0.5) for every doc.
    val ln05 = BigDecimal(-math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(losses(0) - ln05) < 1e-9,
      s"round-1 loss ${losses(0)} != -ln(0.5) = $ln05")
  }

  test("llm_kl_corpus_shift: one row per source, KL >= 0 within rounding " +
       "slack, token totals add up") {
    val out = Registry.byName("llm_kl_corpus_shift").fn(spark, sf).collect()
    val sources = Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(out.length == sources)
    // Each of the <= 4096 contributions is rounded at 1e-6, so the sum
    // can undershoot 0 by at most ~4096 * 5e-7.
    out.foreach { r =>
      assert(r.getDouble(2) > -0.005, s"${r.getString(0)}: kl_fwd < 0")
      assert(r.getDouble(3) > -0.005, s"${r.getString(0)}: kl_rev < 0")
    }
    val totalToks = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), " ")).as("t"))
      .count()
    assert(out.map(_.getLong(1)).sum == totalToks,
      "per-source token counts must partition the corpus token count")
  }
}
