package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events read path is the one schema-adaptive loader (Tables.events
  * dispatches on the parquet ts type — SURVEY §7.4.1). Pin BOTH layouts
  * and, per the r8 ADVICE item, pin tz-INDEPENDENCE: the ns→NTZ and
  * µs→NTZ reconstructions must be literal-epoch arithmetic, yielding the
  * same wall-clock under any session timezone at execution time. */
class TablesSpec extends SparkSuite {

  // 2024-03-01T12:34:56.789123456 UTC, as ns and µs since epoch
  private val ns = 1709296496789123456L
  private val usWall = "2024-03-01 12:34:56.789123"

  private val tmpDirs = scala.collection.mutable.Buffer.empty[java.nio.file.Path]

  override def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tmpDirs.foreach { d =>
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    super.afterAll()
  }

  private def writeEvents(dir: java.nio.file.Path, tsField: StructField,
                          tsValue: Any): String = {
    tmpDirs += dir
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("event_type", StringType), StructField("user_id", LongType),
      StructField("value", DoubleType)))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, tsValue, "click", 7L, 1.0)), schema)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private def withTz[A](tz: String)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try { spark.conf.set("spark.sql.session.timeZone", tz); body }
    finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  private def readWall(dir: String): (String, DataType) = {
    val df = Tables.events(spark, dir)
    val tpe = df.schema("ts").dataType
    // cast AFTER the loader's reconstruction, under whatever tz is set
    (df.select(col("ts").cast("string")).collect()(0).getString(0), tpe)
  }

  test("events: pre-r7 ns-long layout reconstructs µs NTZ, tz-independently") {
    val dir = writeEvents(
      java.nio.file.Files.createTempDirectory("tables_spec_ns"),
      StructField("ts", LongType), ns)
    val (utc, tpe) = readWall(dir)
    assert(tpe == TimestampNTZType, s"ts stayed $tpe")
    assert(utc == usWall, s"ns layout wall-clock: $utc")
    // the ADVICE trap: re-set the session tz AFTER load, BEFORE action —
    // a TimestampType round-trip would shift the wall-clock by 9h here
    val shifted = withTz("Asia/Tokyo") { readWall(dir)._1 }
    assert(shifted == usWall, s"ns reconstruction is tz-dependent: $shifted")
  }

  test("events: adjusted-to-UTC µs layout reconstructs the same NTZ wall-clock") {
    // write a TimestampType column (parquet isAdjustedToUTC=true) holding
    // the same instant; loader must recover the UTC wall-clock under any tz
    val inst = java.time.Instant.ofEpochSecond(ns / 1000000000L,
                                               (ns % 1000000000L) / 1000 * 1000)
    val dir = writeEvents(
      java.nio.file.Files.createTempDirectory("tables_spec_us"),
      StructField("ts", TimestampType), java.sql.Timestamp.from(inst))
    val (utc, tpe) = readWall(dir)
    assert(tpe == TimestampNTZType, s"ts stayed $tpe")
    assert(utc == usWall, s"µs layout wall-clock: $utc")
    val shifted = withTz("America/New_York") { readWall(dir)._1 }
    assert(shifted == usWall, s"µs reconstruction is tz-dependent: $shifted")
  }

  test("events: unexpected ts type fails fast instead of silently nulling") {
    val dir = writeEvents(
      java.nio.file.Files.createTempDirectory("tables_spec_bad"),
      StructField("ts", StringType), "2024-03-01 12:34:56")
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("unsupported type"))
  }
}
