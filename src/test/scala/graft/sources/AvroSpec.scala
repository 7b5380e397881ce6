package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decode-contract pins for the avro-core container reader — the cases
  * the oracled src_avro fixture (5 small clean files) cannot exercise:
  * multi-block layout, deflate codec, JSON escaping of hostile strings,
  * reader-schema resolution (projection + default-fill), and writer
  * byte-determinism (the fixed sync marker). */
class AvroSpec extends SparkSuite {

  private val schemaJson =
    """{"type":"record","name":"t","fields":[
         {"name":"id","type":"int"},
         {"name":"s","type":"string"}]}"""

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-avro")

  test("writer is byte-deterministic (fixed sync marker + fixed deflate)") {
    val rows = (0 until 50).map(i => Map[String, Any]("id" -> i, "s" -> s"v$i"))
    val d = tmpDir()
    try {
      Avro.write(s"$d/a.avro", schemaJson, rows, blockRecords = 7)
      Avro.write(s"$d/b.avro", schemaJson, rows, blockRecords = 7)
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d/a.avro"))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$d/b.avro"))
      assert(java.util.Arrays.equals(a, b), "writer is not byte-deterministic")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
  }

  test("multi-block deflate file decodes every record in order") {
    val n = 1000
    val rows = (0 until n).map(i => Map[String, Any]("id" -> i, "s" -> ("x" * (i % 37))))
    val d = tmpDir()
    try {
      Avro.write(s"$d/blocks.avro", schemaJson, rows, blockRecords = 13)
      val got = Avro.scan(spark, d.toString)
        .orderBy(col("record_idx"))
        .collect()
      assert(got.length == n)
      // spot-decode first/last/some middle records through from_json
      val st = StructType(Seq(StructField("id", IntegerType), StructField("s", StringType)))
      val parsed = Avro.scan(spark, d.toString)
        .select(col("record_idx"), from_json(col("json"), st).as("r"))
        .select(col("record_idx"), col("r.id"), col("r.s"))
        .orderBy(col("record_idx")).collect()
      assert(parsed.forall(r => r.getLong(0) == r.getInt(1).toLong))
      assert(parsed(999).getString(2) == "x" * (999 % 37))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
  }

  test("hostile strings survive the JSON surface (quotes, backslash, newline, unicode)") {
    val hostiles = Seq("say \"hi\"", "back\\slash", "line\nbreak", "tab\there", "ünïcødé ☃")
    val rows = hostiles.zipWithIndex.map { case (s, i) => Map[String, Any]("id" -> i, "s" -> s) }
    val d = tmpDir()
    try {
      Avro.write(s"$d/h.avro", schemaJson, rows)
      val st = StructType(Seq(StructField("id", IntegerType), StructField("s", StringType)))
      val got = Avro.scan(spark, d.toString)
        .select(from_json(col("json"), st).as("r"))
        .select(col("r.id"), col("r.s"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      hostiles.zipWithIndex.foreach { case (s, i) =>
        assert(got(i) == s, s"hostile #$i mangled: ${got(i)}")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
  }

  test("reader-schema resolution: projection drops a field, new field default-fills") {
    val rows = (0 until 10).map(i => Map[String, Any]("id" -> i, "s" -> s"v$i"))
    val d = tmpDir()
    try {
      Avro.write(s"$d/r.avro", schemaJson, rows)
      // reader schema: drop `s`, add defaulted `flag` — Avro resolution rules
      val readerJson =
        """{"type":"record","name":"t","fields":[
             {"name":"id","type":"int"},
             {"name":"flag","type":"string","default":"none"}]}"""
      val st = StructType(Seq(StructField("id", IntegerType), StructField("flag", StringType)))
      val got = Avro.scan(spark, d.toString, readerSchemaJson = Some(readerJson))
        .select(from_json(col("json"), st).as("r"))
        .select(col("r.id"), col("r.flag"))
        .orderBy(col("id")).collect()
      assert(got.length == 10)
      assert(got.forall(_.getString(1) == "none"))
      val noS = Avro.scan(spark, d.toString, readerSchemaJson = Some(readerJson))
        .select(col("json")).head().getString(0)
      assert(!noS.contains("\"s\""), s"projected-away field leaked: $noS")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
  }
}
