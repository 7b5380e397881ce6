package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Trend-family invariants beyond the oracle hash: seasonal indices
  * weight-average to 1, the F2 sketch genuinely upper-bounds, and the
  * zstd sink really writes zstd files. */
class TrendsSpec extends SparkSuite {

  test("q_seasonal_idx: 7 rows whose day-weighted index averages to 1") {
    val rows = Registry.byName("q_seasonal_idx").fn(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 7).toSet))
    assert(rows.length >= 6, s"expected ~7 DOW rows, got ${rows.length}")
    val totalDays = rows.map(_.getLong(1)).sum
    val weighted = rows.map(r => r.getDouble(3) * r.getLong(1)).sum / totalDays
    assert(math.abs(weighted - 1.0) < 1e-4,
      s"day-weighted seasonal index drifted from 1: $weighted")
  }

  test("q_growth_rate: first month NULL growth, ratios recompute") {
    val rows = Registry.byName("q_growth_rate").fn(spark, sf).collect()
    assert(rows.length > 12, "needs a multi-month series")
    assert(rows.head.isNullAt(2), "first month must have NULL growth")
    rows.sliding(2).foreach { case Array(a, b) =>
      val expect = (b.getDouble(1) - a.getDouble(1)) / a.getDouble(1)
      assert(math.abs(b.getDouble(2) - expect) < 1e-5,
        s"growth mismatch at ${b.get(0)}")
    case _ => ()
    }
  }

  test("q_densify: complete grid, totals preserved, zero-fill present") {
    val rows = Registry.byName("q_densify").fn(spark, sf).collect()
    val months = rows.map(_.getDate(0).toString).distinct.length
    val prios = rows.map(_.getString(1)).distinct.length
    assert(rows.length == months * prios, "grid is not the full cross product")
    assert(rows.map(_.getLong(2)).sum == Tables.orders(spark, sf).count(),
      "densification changed the total count")
  }

  test("q_backtest: 12-month alignment and APE recompute") {
    val rows = Registry.byName("q_backtest").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val revByMonth = Registry.byName("q_growth_rate").fn(spark, sf)
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val m = r.getDate(0).toLocalDate
      val expected = revByMonth.get(m.minusMonths(12).toString)
      assert(expected.contains(r.getDouble(2)),
        s"$m: forecast is not the t-12 revenue")
      val ape = math.abs(r.getDouble(1) - r.getDouble(2)) / r.getDouble(1)
      assert(math.abs(r.getDouble(3) - ape) < 1e-5, s"$m: APE mismatch")
    }
  }

  test("q_motifs: descending counts, trigram arity") {
    val rows = Registry.byName("q_motifs").fn(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ns = rows.map(_.getLong(3))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q_f2_moment: estimate upper-bounds the exact moment, tightly here") {
    val r = Registry.byName("q_f2_moment").fn(spark, sf).head()
    val exactDirect = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    assert(r.getLong(0) == exactDirect, "exact F2 disagrees with direct compute")
    assert(r.getLong(1) >= r.getLong(0), "CMS inner product must upper-bound F2")
    assert(r.getBoolean(2), s"4×8192 cells should be tight at sf0.001: $r")
  }

  test("snk_parquet_zstd: files are zstd-coded and the round-trip is faithful") {
    val out = Registry.byName("snk_parquet_zstd").fn(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .orderBy(col("l_returnflag"))
    assertSameRows(out, direct)
    val files = new java.io.File(s"${graft.Fixtures.dir}/lineitem_zstd")
      .listFiles().map(_.getName).filter(_.endsWith(".parquet"))
    assert(files.nonEmpty && files.forall(_.contains("zstd")),
      s"expected zstd-coded parquet parts: ${files.toSeq}")
  }

  test("snk_parquet_bloom: footer carries a bloom filter on l_orderkey; probe stays exact") {
    val out = Registry.byName("snk_parquet_bloom").fn(spark, sf)
    val direct = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), H.dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag"))
    assertSameRows(out, direct)
    val dir = new java.io.File(s"${graft.Fixtures.dir}/lineitem_bloom")
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val colMeta = rg.getColumns.asScala
        .find(_.getPath.toDotString == "l_orderkey").get
      assert(colMeta.getBloomFilterOffset > 0,
        "no bloom filter offset recorded for l_orderkey")
      val bloom = reader.readBloomFilter(colMeta)
      assert(bloom != null, "bloom filter not readable")
    } finally reader.close()
    // Equality probe through the bloom-backed layout is still exact.
    val probeKey = Tables.lineitem(spark, sf).select(min(col("l_orderkey")))
      .head().getLong(0)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === probeKey).count()
    val got = spark.read.parquet(dir.getAbsolutePath)
      .filter(col("l_orderkey") === probeKey).count()
    assert(got == expected && got > 0)
  }

  test("q_holt / q_holt_winters: a constant series forecasts the constant with zero MAE") {
    // Analytic fixed point of every exponential-smoothing recurrence:
    // level locks to the constant, trend and seasonal terms stay at
    // their zero seed, every one-step error is exactly 0.0 — any
    // drift here means the recurrence leaks between state components.
    val dir = s"${graft.Fixtures.dir}/constant_series_fixture"
    // one order per day at a constant price: daily revenue is EXACTLY
    // 100.0 for every day in the span, so the law is exact
    Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("o_orderdate"))
      .agg(min(col("o_orderkey")).as("o_orderkey"))
      .withColumn("o_custkey", lit(0L))
      .withColumn("o_orderstatus", lit("O"))
      .withColumn("o_totalprice", lit(100.0))
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val nDays = Tables.orders(spark, sf)
      .select(date_trunc("day", col("o_orderdate"))).distinct().count()
    val h = Registry.byName("q_holt").fn(spark, dir).collect()(0)
    assert(h.getLong(0) == nDays)
    assert(h.getDouble(1) == 100.0 && h.getDouble(2) == 100.0
             && h.getDouble(3) == 0.0,
      s"holt fixed point violated: $h")
    val hw = Registry.byName("q_holt_winters").fn(spark, dir).collect()(0)
    assert(hw.getDouble(1) == 100.0 && hw.getDouble(2) == 0.0,
      s"holt-winters fixed point violated: $hw")
  }

  test("q_holt_winters: distributed fold matches a sequential Scala recurrence") {
    val r = Registry.byName("q_holt_winters").fn(spark, sf).collect()(0)
    val days = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(H.D)).cast("double").as("rev"))
      .orderBy(col("day")).collect().map(_.getDouble(1))
    var l = days.head; var t = 0.0; var serr = 0.0
    var seas = Array.fill(7)(0.0)
    days.tail.foreach { y =>
      val s1 = seas(0)
      serr += math.abs(y - (l + t + s1))
      val l2 = 0.5 * (y - s1) + 0.5 * (l + t)
      val t2 = 0.3 * (0.5 * (y - s1) + 0.5 * (l + t) - l) + 0.7 * t
      seas = seas.drop(1) :+ (0.25 * (y - (0.5 * (y - s1) + 0.5 * (l + t)))
                              + 0.75 * s1)
      l = l2; t = t2
    }
    assert(r.getLong(0) == days.length)
    assert(math.abs(r.getDouble(1) - (l + t + seas(0))) < 1e-6,
      s"forecast_1 ${r.getDouble(1)} != fold ${l + t + seas(0)}")
    assert(math.abs(r.getDouble(2) - serr / (days.length - 1)) < 1e-6,
      s"mae ${r.getDouble(2)} != fold ${serr / (days.length - 1)}")
  }

  test("q_holt: distributed fold matches a sequential Scala recurrence") {
    // The declared query's in-row aggregate() must be the SAME sequential
    // recurrence a driver-side fold computes — recomputed here from the
    // daily series with identical update order, bit-compared after the
    // same rounding.
    val r = Registry.byName("q_holt").fn(spark, sf).collect()(0)
    val days = Tables.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast(H.D)).cast("double").as("rev"))
      .orderBy(col("day")).collect().map(_.getDouble(1))
    var l = days.head; var t = 0.0; var serr = 0.0
    days.tail.foreach { y =>
      serr += math.abs(y - (l + t))
      val l2 = 0.5 * y + 0.5 * (l + t)
      val t2 = 0.3 * (0.5 * y + 0.5 * (l + t) - l) + 0.7 * t
      l = l2; t = t2
    }
    assert(r.getLong(0) == days.length)
    assert(math.abs(r.getDouble(1) - (l + t)) < 1e-6,
      s"forecast_1 ${r.getDouble(1)} != fold ${l + t}")
    assert(math.abs(r.getDouble(2) - (l + 7 * t)) < 1e-6,
      s"forecast_7 ${r.getDouble(2)} != fold ${l + 7 * t}")
    assert(math.abs(r.getDouble(3) - serr / (days.length - 1)) < 1e-6,
      s"mae ${r.getDouble(3)} != fold ${serr / (days.length - 1)}")
  }
}
