package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2: a fixed-width (copybook-style) text reader with
  * REAL pushdown — the case where the built-in text source genuinely
  * can't express the semantics (`spark.read.text` + substring parsing
  * works, see src_fixed_width, but parses every byte of every column of
  * every row; the format itself knows better). The V2 contract gives the
  * format its own scan:
  *
  *  - `SupportsPushDownRequiredColumns`: only requested fields are ever
  *    sliced/parsed — a 2-column projection of a 40-field copybook does
  *    2 substring+parse ops per row, not 40 (column pruning inside a
  *    row-oriented text format);
  *  - `SupportsPushDownFilters`: `IsNotNull` and numeric `GreaterThan`
  *    evaluate inside the reader against the raw slice, before any other
  *    field of the row is parsed — the scan emits only surviving rows,
  *    and Spark drops its own copy of the pushed predicates;
  *  - one `InputPartition` per file: the natural split unit for
  *    line-oriented fixed-width data (a 100 TB feed arrives as many
  *    files; per-file readers parallelize exactly like the text source —
  *    finer in-file byte-range splitting would follow the same recipe
  *    with seek-to-line-boundary).
  *
  * Layout is declared via options: `layout=name:start:len:type,...`
  * (1-based start, types long|double|string — string fields are
  * right-trimmed). Usage:
  *
  * {{{
  *   spark.read.format("graft.sources.FixedWidthSource")
  *     .option("path", dir).option("layout", "c_custkey:1:10:long,...")
  *     .load()
  * }}}
  */
class FixedWidthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthLayout.parse(options.get("layout")).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new FixedWidthTable(properties.get("path"),
      FixedWidthLayout.parse(properties.get("layout")))

  override def supportsExternalMetadata(): Boolean = false
}

/** One field of the layout: [start, start+len) slice of each line. */
case class FwField(name: String, start: Int, len: Int, dt: DataType)

case class FixedWidthLayout(fields: Seq[FwField]) {
  def schema: StructType =
    StructType(fields.map(f => StructField(f.name, f.dt, nullable = true)))
}

object FixedWidthLayout {
  def parse(spec: String): FixedWidthLayout = {
    require(spec != null && spec.nonEmpty, "fixedwidth requires a layout option")
    FixedWidthLayout(spec.split(",").toSeq.map { part =>
      val Array(name, start, len, tpe) = part.trim.split(":")
      val dt = tpe match {
        case "long"   => LongType
        case "double" => DoubleType
        case "string" => StringType
        case other    => throw new IllegalArgumentException(
          s"fixedwidth layout type '$other' (field $name); use long|double|string")
      }
      FwField(name, start.toInt, len.toInt, dt)
    })
  }
}

class FixedWidthTable(path: String, layout: FixedWidthLayout)
    extends Table with SupportsRead {
  require(path != null, "fixedwidth requires a path")
  override def name(): String = s"fixedwidth($path)"
  override def schema(): StructType = layout.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixedWidthScanBuilder(path, layout)
}

class FixedWidthScanBuilder(path: String, layout: FixedWidthLayout)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = layout.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Spark hands the post-pruning schema; empty means count-only scans —
    // keep zero fields and emit empty rows.
    required = requiredSchema
  }

  /** Accept IsNotNull(any field) and GreaterThan(field, numeric literal)
    * — the predicates a raw-slice evaluator can decide. Everything else
    * stays with Spark (returned as post-scan residual). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val byName = layout.fields.map(f => f.name -> f).toMap
    val (accepted, residual) = filters.partition {
      case IsNotNull(a) => byName.contains(a)
      case GreaterThan(a, v) => byName.get(a).exists(f =>
        (f.dt == LongType || f.dt == DoubleType) && v.isInstanceOf[Number])
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new FixedWidthScan(path, layout,
      required.fields.map(f => layout.fields.find(_.name == f.name).get).toSeq,
      pushed)
}

class FixedWidthScan(path: String, layout: FixedWidthLayout,
                     projected: Seq[FwField], pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(projected.map(f => StructField(f.name, f.dt)))

  // Surfaces in `.explain` output so the plan audit can assert the
  // pushdown actually reached the custom scan.
  override def description(): String =
    s"FixedWidthScan path=$path fields=[${projected.map(_.name).mkString(",")}] " +
      s"pushed=[${pushed.mkString(",")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val root = Paths.get(path)
    val files = Files.list(root).iterator().asScala
      .filter(p => { val n = p.getFileName.toString
                     !n.startsWith(".") && !n.startsWith("_") })
      .map(_.toString).toArray.sorted
    files.map(FixedWidthPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(layout, projected, pushed)
}

case class FixedWidthPartition(file: String) extends InputPartition

class FixedWidthReaderFactory(layout: FixedWidthLayout,
                              projected: Seq[FwField], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FixedWidthReader(partition.asInstanceOf[FixedWidthPartition].file,
      layout, projected, pushed)
}

/** Line reader: evaluates pushed predicates on raw slices first, then
  * parses only the projected fields of surviving lines. */
class FixedWidthReader(file: String, layout: FixedWidthLayout,
                       projected: Seq[FwField], pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val byName = layout.fields.map(f => f.name -> f).toMap
  private val lines = Files.newBufferedReader(
    Paths.get(file), StandardCharsets.UTF_8)
  private var current: InternalRow = _

  private def slice(line: String, f: FwField): String = {
    val from = f.start - 1
    if (from >= line.length) "" else line.substring(from, math.min(from + f.len, line.length))
  }

  private def parse(line: String, f: FwField): Any = {
    val raw = slice(line, f)
    f.dt match {
      case LongType   => val t = raw.trim; if (t.isEmpty) null else t.toLong
      case DoubleType => val t = raw.trim; if (t.isEmpty) null else t.toDouble
      case StringType => val t = raw.replaceAll("\\s+$", "")
        UTF8String.fromString(t)
    }
  }

  private def survives(line: String): Boolean = pushed.forall {
    case IsNotNull(a) => slice(line, byName(a)).trim.nonEmpty
    case GreaterThan(a, v) =>
      val raw = slice(line, byName(a)).trim
      raw.nonEmpty && (byName(a).dt match {
        case LongType   => raw.toLong > v.asInstanceOf[Number].longValue()
        case DoubleType => raw.toDouble > v.asInstanceOf[Number].doubleValue()
        case _ => false
      })
    case _ => true
  }

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null && !survives(line)) line = lines.readLine()
    if (line == null) { current = null; false }
    else {
      val l = line
      current = InternalRow.fromSeq(projected.map(parse(l, _)))
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
