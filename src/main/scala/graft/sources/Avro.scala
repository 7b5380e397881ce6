package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import java.io.ByteArrayInputStream

/** Avro container-file ingest — built directly on the avro-core jar that
  * ships with Spark's runtime classpath (`/opt/spark/jars/avro-1.12.1.jar`);
  * no spark-avro datasource module is present in this image, so the engine
  * reads the container format itself.
  *
  * Why it exists: Avro is the one remaining row-oriented interchange format
  * a registration pipeline sees from upstream exporters (Kafka dumps,
  * sqoop-era extracts) after TSV/CSV/JSON/xlsx/parquet/orc are covered.
  * The reference's surface is "ingest whatever the curator sends"
  * `[PK, SURVEY §0.1]`; this closes the format list.
  *
  * Scale shape: Avro container files from an exporter are a MANY-FILES
  * source (one file per topic-partition-epoch), so — exactly like
  * [[Xlsx.scan]] — the engine reads them with the binaryFile source
  * (file-parallel, one task per file) and decodes blocks on executors.
  * The driver never touches record bytes. Within a file, Avro's own
  * sync-marker block structure keeps memory bounded: [[DataFileStream]]
  * decompresses one block at a time.
  *
  * Decode contract (pinned by AvroSpec):
  *  - records surface as JSON strings ([[GenericRecord]]'s canonical JSON
  *    rendering — escaping pinned in the spec) so the engine-side schema
  *    stays EXPLICIT: callers parse with `from_json` + a declared
  *    StructType, the same never-infer rule every other source follows;
  *  - any codec the avro-core jar knows (null, deflate) decodes
  *    transparently — block structure is handled by the library;
  *  - reader-side projection uses Avro schema resolution: pass an
  *    expected (reader) schema and fields drop / default-fill per the
  *    Avro spec — the columnar-pruning analogue for a row format.
  */
object Avro {

  /** Parse an Avro schema JSON string (driver- or executor-side). */
  def schema(json: String): Schema = new Schema.Parser().parse(json)

  // ---- scan: binaryFile fan-out, executor-side block decode ----

  /** Every record of every `*.avro` file under `path`, as
    * (file, record_idx, json). File-parallel: one decode task per file;
    * block-streamed: one decompressed block in memory at a time.
    * `readerSchemaJson` optionally applies Avro schema resolution
    * (projection / defaulting) inside the decode. */
  def scan(s: SparkSession, path: String,
           readerSchemaJson: Option[String] = None): DataFrame = {
    import s.implicits._
    // The Option must resolve to a serializable closure input (Schema is
    // not serializable) — ship the JSON string, parse per-partition.
    val readerJson = readerSchemaJson
    s.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val datumReader = readerJson match {
          case Some(j) =>
            new GenericDatumReader[GenericRecord](null, new Schema.Parser().parse(j))
          case None => new GenericDatumReader[GenericRecord]()
        }
        val in = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(bytes), datumReader)
        // Stream, never buffer: flatMap consumes this iterator lazily,
        // so at any moment the executor holds the file bytes plus ONE
        // decompressed block — not a JSON rendering of every record
        // (which for a multi-hundred-MB exporter file would double or
        // triple the resident size). Close rides exhaustion; a partial
        // read (task kill) leaks only a heap-backed stream for GC —
        // there is no file handle, the input is the in-memory bytes.
        new Iterator[(String, Long, String)] {
          private var i = 0L
          private var open = true
          override def hasNext: Boolean = {
            if (open && !in.hasNext) { in.close(); open = false }
            open
          }
          override def next(): (String, Long, String) = {
            if (!hasNext) throw new NoSuchElementException
            val rec = (file, i, in.next().toString); i += 1; rec
          }
        }
      }
      .toDF("file", "record_idx", "json")
  }

  // ---- deterministic writer (fixture + round-trip testing only) ----

  /** Fixed sync marker so identical input produces identical bytes —
    * DataFileWriter otherwise randomizes the 16-byte marker per file. */
  private val fixedSync: Array[Byte] =
    "graft.avro.sync!".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Write one Avro container file of `rows` (field-name → value maps)
    * under `schemaJson`, deflate-compressed. Deterministic bytes: fixed
    * sync marker + fixed deflate level. `blockRecords` bounds records per
    * block so multi-block files (the real layout) are exercised. */
  def write(path: String, schemaJson: String, rows: Seq[Map[String, Any]],
            blockRecords: Int = 1000): Unit = {
    val sch = schema(schemaJson)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](sch))
    w.setCodec(CodecFactory.deflateCodec(6))
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    val out = java.nio.file.Files.newOutputStream(p)
    try {
      w.create(sch, out, fixedSync)
      var n = 0
      rows.foreach { m =>
        val rec = new GenericData.Record(sch)
        m.foreach { case (k, v) => rec.put(k, v) }
        w.append(rec)
        n += 1
        if (n % blockRecords == 0) w.sync() // close the block: multi-block layout
      }
    } finally w.close() // closes `out` too
  }
}
