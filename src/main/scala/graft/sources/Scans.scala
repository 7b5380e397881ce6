package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** SURVEY §2a — scans / sources / sinks.
  *
  * CSV/JSON fixtures are materialized deterministically (sorted, fixed
  * formatting) under [[graft.Fixtures.dir]] so both Spark and the
  * DuckDB oracle read the exact same bytes. The reference's primary input
  * is curator TSV spreadsheets; JSON-lines is its metadata-document form.
  */
object Scans {

  private val fixDir = graft.Fixtures.dir

  /** Deterministic fixture write: same bytes every run, overwriting any
    * prior copy (NOT write-once — a stale fixture from an older code
    * version must never survive a rerun). */
  private def writeFixture(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  val nationCsvPath = s"$fixDir/nation.tsv"
  val xlsxDirPath = s"$fixDir/nation_xlsx"
  val xlsxTsvPath = s"$fixDir/nation_xlsx.tsv"
  val xlsxDatesDirPath = s"$fixDir/orders_xlsx_dates"
  val xlsxDatesTsvPath = s"$fixDir/orders_xlsx_dates.tsv"
  val catalogMetaPath = s"$fixDir/catalog_meta"
  val catalogReplacePath = s"$fixDir/catalog_meta_replace"
  val catalogListPath = s"$fixDir/catalog_meta_list"
  val catalogListTsvPath = s"$fixDir/catalog_list.tsv"
  val catalogAsofPath = s"$fixDir/catalog_meta_asof"
  val catalogHistPath = s"$fixDir/catalog_meta_hist"
  val catalogHistTsvPath = s"$fixDir/catalog_hist.tsv"
  val avroDirPath = s"$fixDir/nation_avro"
  val avroTsvPath = s"$fixDir/nation_avro.tsv"
  val xmlDirPath = s"$fixDir/nation_xml"
  val xmlTsvPath = s"$fixDir/nation_xml.tsv"
  val ordersJsonPath = s"$fixDir/orders100.jsonl"
  val manifestTreePath = s"$fixDir/manifest_tree"
  val manifestTsvPath = s"$fixDir/manifest_tree.tsv"
  val manifestTree2Path = s"$fixDir/manifest_tree_v2"
  val manifestTsv2Path = s"$fixDir/manifest_tree_v2.tsv"

  /** Deterministic fixture tree off the 25 nation rows: one file per
    * nation under its region dir. v2 applies a fixed drift — nations with
    * key % 7 == 0 are dropped, key % 5 == 0 gain a revision line, and
    * three new files appear under a new dir — so a v1→v2 diff exercises
    * every status. Returns the (relative_path, n_bytes, sha256) manifest
    * computed independently of Spark via MessageDigest; the target dir is
    * wiped first so reruns converge even if the drift spec evolves. */
  private def writeManifestTree(s: org.apache.spark.sql.SparkSession,
                                dir: String, root: String,
                                v2: Boolean): Seq[(String, Long, String)] = {
    val rows = Tables.nation(s, dir).orderBy(col("n_nationkey"))
      .collect() // 25 rows, fixed size at every sf — driver-side ok
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val rootP = Paths.get(root)
    if (Files.exists(rootP)) {
      import scala.jdk.CollectionConverters._
      Files.walk(rootP).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(Files.delete(_))
    }
    val base = rows.toSeq.flatMap { case (k, name, r) =>
      if (v2 && k % 7 == 0) None
      else {
        val extra = if (v2 && k % 5 == 0) "revision=2\n" else ""
        Some((s"region_$r/$name.txt",
              s"nationkey=$k\nname=$name\nregionkey=$r\n$extra"))
      }
    }
    val added =
      if (v2) (0 until 3).map(i => (s"region_9/extra_$i.txt", s"extra=$i\n"))
      else Seq()
    (base ++ added).map { case (rel, content) =>
      val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val p = Paths.get(s"$root/$rel")
      Files.createDirectories(p.getParent)
      Files.write(p, bytes)
      (rel, bytes.length.toLong, md.digest(bytes).map(b => f"$b%02x").mkString)
    }.sortBy(_._1)
  }

  private def manifestTsv(m: Seq[(String, Long, String)]): String =
    "relative_path\tn_bytes\tsha256\n" +
      m.map { case (p, n, h) => s"$p\t$n\t$h" }.mkString("", "\n", "\n")

  val qs: Seq[(String, Q)] = Seq(

    // Columnar scan + projection + pushed filter (PushedFilters/ReadSchema
    // audited in the plan spec).
    "src_parquet" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
              FROM lineitem WHERE l_quantity >= 45.0
              ORDER BY l_orderkey, l_linenumber""")),

    // Delimited text with explicit schema, header, sep=\t.
    "src_csv" -> Q(
      (s, dir) => {
        val rows = Tables.nation(s, dir)
          .orderBy(col("n_nationkey"))
          .collect()  // 25 rows, fixed size at every sf — driver-side ok
          .map(r => s"${r.getInt(0)}\t${r.getString(1)}\t${r.getInt(2)}")
        writeFixture(nationCsvPath,
          "n_nationkey\tn_name\tn_regionkey\n" + rows.mkString("", "\n", "\n"))
        val st = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.option("sep", "\t").option("header", "true").schema(st)
          .csv(nationCsvPath)
          .orderBy(col("n_nationkey"))
      },
      Some(s"""SELECT n_nationkey, n_name, n_regionkey
               FROM read_csv('$nationCsvPath', delim='\t', header=true,
                             columns={'n_nationkey': 'INTEGER',
                                      'n_name': 'VARCHAR',
                                      'n_regionkey': 'INTEGER'})
               ORDER BY n_nationkey""")),

    // Excel workbook ingest — the reference's curator inputs are
    // occasionally Excel exports [PK, SURVEY §0.1]; through r9 this was
    // the one uncovered input format (marked out of scope for lack of a
    // POI jar). graft.sources.Xlsx closes it with a pure-JDK zip+StAX
    // parser: one workbook per curator submission is a many-small-files
    // source, so the scan is binaryFile (file-parallel, parse on
    // executors) — here 5 per-region workbooks with shared-strings
    // tables exactly as Excel emits them. The oracle TSV is written
    // INDEPENDENTLY from the same collected rows (the src_dir_manifest
    // pattern), so the hash gate genuinely checks the xlsx parser: a
    // mis-resolved shared string or shifted column breaks it.
    "src_xlsx" -> Q(
      (s, dir) => {
        val rows = Tables.nation(s, dir).orderBy(col("n_nationkey"))
          .collect() // 25 rows, fixed size at every sf — driver-side ok
          .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        rows.groupBy(_._3).foreach { case (region, rs) =>
          Xlsx.write(s"$xlsxDirPath/nation_r$region.xlsx",
            Seq(Seq("n_nationkey", "n_name", "n_regionkey")) ++
              rs.sortBy(_._1).map(t => Seq(t._1, t._2, t._3)))
        }
        writeFixture(xlsxTsvPath,
          "n_nationkey\tn_name\tn_regionkey\n" +
            rows.map(t => s"${t._1}\t${t._2}\t${t._3}").mkString("", "\n", "\n"))
        Xlsx.scan(s, xlsxDirPath)
          .filter(col("row_idx") > 0) // drop each workbook's header row
          .select(col("cells").getItem(0).cast("int").as("n_nationkey"),
                  col("cells").getItem(1).as("n_name"),
                  col("cells").getItem(2).cast("int").as("n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some(s"""SELECT n_nationkey, n_name, n_regionkey
               FROM read_csv('$xlsxTsvPath', delim='\t', header=true,
                             columns={'n_nationkey': 'INTEGER',
                                      'n_name': 'VARCHAR',
                                      'n_regionkey': 'INTEGER'})
               ORDER BY n_nationkey""")),

    // Persisted CATALOG resolution — names that survive the session
    // (r10 VERDICT "What's missing" #2: all tables were path-registered
    // per session; at 100 TB a lake needs a metadata layer). The query
    // REGISTERS nation/region in a file-backed catalog (JSON-lines,
    // atomic-rename published — graft.sources.Catalog), then resolves
    // them from a BRAND-NEW SparkSession that is handed only the
    // catalog dir and the names: Catalog.attach registers every
    // persisted table as a view and the join runs through spark.sql
    // against the NAMES. Catalog cost is O(#tables) metadata; the scan
    // itself still partition-prunes from the path layout — the data
    // never moves through the catalog. Oracle: the same join over the
    // parquet paths directly.
    "src_catalog_persist" -> Q(
      (s, dir) => {
        Catalog.register(catalogMetaPath, Seq(
          Catalog.Entry("cat_nation", "parquet", s"$dir/nation.parquet", Nil),
          Catalog.Entry("cat_region", "parquet", s"$dir/region.parquet", Nil)))
        // a fresh session: shares the SparkContext (one JVM) but has its
        // OWN state — no temp views, no conf carried over. Resolution
        // must come from the persisted file alone.
        val s2 = s.newSession()
        Catalog.attach(s2, catalogMetaPath)
        s2.sql("""SELECT r.r_name, count(*) AS n_nations,
                         min(n.n_name) AS first_nation
                  FROM cat_nation n JOIN cat_region r
                    ON n.n_regionkey = r.r_regionkey
                  GROUP BY r.r_name ORDER BY r.r_name""")
      },
      Some("""SELECT r.r_name, count(*) AS n_nations,
                     min(n.n_name) AS first_nation
              FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
              GROUP BY r.r_name ORDER BY r.r_name""")),

    // Catalog REPLACE semantics (r11 VERDICT #5): a name is re-published
    // to point at different data — the registry-upsert shape — and a
    // session created AFTER the replace must resolve the NEW binding,
    // while a dropped name must be gone. The query registers cat_t →
    // nation, replaces it with cat_t → region (last-writer-wins, pinned
    // in Catalog's writer-lock scaladoc + CatalogSpec's concurrency
    // tests), registers-then-drops cat_drop_me, and resolves cat_t from
    // a brand-new session. The hash gate is genuine: a replace that
    // keeps the old binding returns 25 nation rows, a drop that doesn't
    // land leaves the view attachable — both break the compare.
    "src_catalog_replace" -> Q(
      (s, dir) => {
        Catalog.reset(catalogReplacePath)
        Catalog.register(catalogReplacePath, Seq(
          Catalog.Entry("cat_t", "parquet", s"$dir/nation.parquet", Nil),
          Catalog.Entry("cat_drop_me", "parquet", s"$dir/nation.parquet", Nil)))
        Catalog.register(catalogReplacePath, Seq( // REPLACE: same name, new data
          Catalog.Entry("cat_t", "parquet", s"$dir/region.parquet", Nil)))
        Catalog.drop(catalogReplacePath, "cat_drop_me")
        val s2 = s.newSession() // resolution from the persisted file alone
        Catalog.attach(s2, catalogReplacePath)
        s2.sql("""SELECT r_regionkey, r_name FROM cat_t
                  ORDER BY r_regionkey""")
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // Catalog LISTING — the information_schema.tables of the lake. The
    // query drives the register → replace → drop state machine from a
    // clean catalog and lists the FINAL state; the oracle TSV is the
    // expected final state spelled as literals (never derived from
    // load()), so the hash gate checks the state machine itself: a
    // replace that appends instead of upserting, a drop that misses, or
    // a listing that leaks the lock/tmp sidecars all break it. O(#tables)
    // driver-side metadata by design — the catalog never touches data.
    "src_catalog_list" -> Q(
      (s, dir) => {
        Catalog.reset(catalogListPath)
        Catalog.register(catalogListPath, Seq(
          Catalog.Entry("t_events", "parquet", s"$dir/events.parquet", Seq("dt")),
          Catalog.Entry("t_lineitem", "parquet", s"$dir/lineitem.parquet", Nil),
          Catalog.Entry("t_tmp", "csv", s"$dir/tmp.csv", Nil)))
        Catalog.register(catalogListPath, Seq( // replace: partition layout evolved
          Catalog.Entry("t_events", "parquet", s"$dir/events.parquet",
                        Seq("dt", "hr"))))
        Catalog.drop(catalogListPath, "t_tmp")
        writeFixture(catalogListTsvPath,
          "name\tformat\trel_path\tpartition_cols\n" +
          "t_events\tparquet\tevents.parquet\tdt,hr\n" +
          "t_lineitem\tparquet\tlineitem.parquet\t-\n")
        val rows = Catalog.load(catalogListPath).map { e =>
          (e.name, e.format,
           e.path.stripPrefix(dir).stripPrefix("/"),
           if (e.partitionCols.isEmpty) "-" else e.partitionCols.mkString(","))
        }
        import s.implicits._
        rows.toDF("name", "format", "rel_path", "partition_cols")
          .orderBy(col("name"))
      },
      Some(s"""SELECT name, format, rel_path, partition_cols
               FROM read_csv('$catalogListTsvPath', delim='\t', header=true,
                             columns={'name': 'VARCHAR', 'format': 'VARCHAR',
                                      'rel_path': 'VARCHAR',
                                      'partition_cols': 'VARCHAR'})
               ORDER BY name""")),

    // Catalog TIME-TRAVEL read (r12 VERDICT #6 — the last registry-shape
    // pattern): every mutation appends versioned put/drop bindings to an
    // append-only history log (history.jsonl, same lock + atomic-rename
    // discipline as tables.jsonl), and `asOf(v)` replays bindings ≤ v —
    // the Delta/Iceberg snapshot-log shape at one-file scale. The query
    // drives register → replace(+new name) → drop from a CLEAN history
    // (resetAll, so versions start at 1 deterministically), then reads
    // EVERY version's resolved state: name + row count + min of each
    // table's name column, all through openAsOf. The oracle spells the
    // expected (version, name, source-table) state machine as literals
    // and derives counts from the real tables, so a replay that resolves
    // v1 to the latest binding, misses the v3 tombstone, or burns a
    // version on a no-op breaks the hash. Metadata-only at any scale:
    // the log is O(#versions × changed names); an as-of read plans
    // exactly like a current read once the path resolves.
    "src_catalog_asof" -> Q(
      (s, dir) => {
        Catalog.resetAll(catalogAsofPath)
        Catalog.register(catalogAsofPath, Seq( // v1
          Catalog.Entry("cat_tt", "parquet", s"$dir/nation.parquet", Nil)))
        Catalog.register(catalogAsofPath, Seq( // v2: replace + a new name
          Catalog.Entry("cat_tt", "parquet", s"$dir/region.parquet", Nil),
          Catalog.Entry("cat_aux", "parquet", s"$dir/nation.parquet", Nil)))
        Catalog.drop(catalogAsofPath, "cat_tt") // v3: tombstone
        val states = (1L to Catalog.currentVersion(catalogAsofPath))
          .flatMap { v =>
            Catalog.asOf(catalogAsofPath, v).map(e => (v, e.name))
          } // ≤ #versions × #names driver-side METADATA rows, never data
        states.map { case (v, name) =>
          val df = Catalog.openAsOf(s, catalogAsofPath, name, v)
          df.agg(count(lit(1)).as("n_rows"),
                 min(col(df.columns(1))).as("first_name"))
            .select(lit(v.toInt).as("version"), lit(name).as("name"),
                    col("n_rows"), col("first_name"))
        }.reduce(_ unionAll _).orderBy(col("version"), col("name"))
      },
      Some("""WITH states AS (
                SELECT * FROM (VALUES (1, 'cat_tt', 'nation'),
                                      (2, 'cat_aux', 'nation'),
                                      (2, 'cat_tt', 'region'),
                                      (3, 'cat_aux', 'nation'))
                       AS t(version, name, src)),
                   srcs AS (
                SELECT 'nation' AS src, count(*) AS n_rows,
                       min(n_name) AS first_name FROM nation
                UNION ALL
                SELECT 'region', count(*), min(r_name) FROM region)
              SELECT s.version, s.name, c.n_rows, c.first_name
              FROM states s JOIN srcs c ON s.src = c.src
              ORDER BY s.version, s.name""")),

    // Catalog HISTORY listing — the audit view of the time-travel log
    // (information_schema.tables × snapshot log): every put/drop binding
    // with its version, in order. Drives the same register →
    // replace(+new) → drop machine as src_catalog_asof from a clean
    // history and lists the LOG itself; the oracle TSV is the expected
    // log spelled as literals, so the hash gate checks version
    // assignment (no-op mutations must not burn one), tombstone
    // emission, and that replaced bindings stay in the log. Wall-clock
    // ts is carried in the file but excluded from the declared row
    // (nondeterministic by nature; CatalogSpec pins its ordering
    // contract instead).
    "src_catalog_history" -> Q(
      (s, dir) => {
        Catalog.resetAll(catalogHistPath)
        Catalog.register(catalogHistPath, Seq( // v1
          Catalog.Entry("t_a", "parquet", s"$dir/nation.parquet", Nil)))
        Catalog.register(catalogHistPath, Seq( // no-op: burns NO version
          Catalog.Entry("t_a", "parquet", s"$dir/nation.parquet", Nil)))
        Catalog.register(catalogHistPath, Seq( // v2: replace + new name
          Catalog.Entry("t_a", "parquet", s"$dir/region.parquet", Seq("r")),
          Catalog.Entry("t_b", "csv", s"$dir/b.csv", Nil)))
        Catalog.drop(catalogHistPath, "t_b") // v3: tombstone
        writeFixture(catalogHistTsvPath,
          "version\top\tname\tformat\trel_path\n" +
          "1\tput\tt_a\tparquet\tnation.parquet\n" +
          "2\tput\tt_a\tparquet\tregion.parquet\n" +
          "2\tput\tt_b\tcsv\tb.csv\n" +
          "3\tdrop\tt_b\t-\t-\n")
        val rows = Catalog.loadHistory(catalogHistPath).map { b =>
          (b.version, b.op, b.entry.name,
           if (b.op == "drop") "-" else b.entry.format,
           if (b.op == "drop") "-"
           else b.entry.path.stripPrefix(dir).stripPrefix("/"))
        }
        import s.implicits._
        rows.toDF("version", "op", "name", "format", "rel_path")
          .orderBy(col("version"), col("name"))
      },
      Some(s"""SELECT version, op, name, format, rel_path
               FROM read_csv('$catalogHistTsvPath', delim='\t', header=true,
                             columns={'version': 'BIGINT', 'op': 'VARCHAR',
                                      'name': 'VARCHAR', 'format': 'VARCHAR',
                                      'rel_path': 'VARCHAR'})
               ORDER BY version, name""")),

    // Excel DATE cells + a second worksheet — the two highest-frequency
    // real-workbook features the raw-string sheet1 contract of src_xlsx
    // deliberately excludes (r10 VERDICT "What's missing" #1). A curator
    // export styles date columns with numFmt 14, storing 1900-system
    // SERIALS (with Lotus 1-2-3's phantom 1900-02-29 at serial 60), and
    // often carries an audit/meta second sheet. The full-workbook scan
    // (Xlsx.scanBook) resolves sheets through workbook.xml's r:id → rels
    // Target indirection (not the sheet1.xml filename shortcut), decodes
    // date-styled numerics via styles.xml, and fans out file-parallel
    // like src_xlsx. Fixture: sheet "export" = 40 orders rows with REAL
    // LocalDate cells (round-trips writer serial → parser ISO against
    // the parquet's own dates in the TSV oracle — the conversion is
    // exercised end-to-end, not self-checked); sheet "audit" = the four
    // leap-bug probe serials 1/59/60/61 written RAW, with their expected
    // dates HARDCODED in the TSV (1900-01-01, 1900-02-28, 1900-02-28
    // clamped phantom, 1900-03-01) so the oracle is independent of the
    // engine's serial math.
    "src_xlsx_dates" -> Q(
      (s, dir) => {
        val rows = Tables.orders(s, dir)
          .orderBy(col("o_orderkey")).limit(40)
          .select(col("o_orderkey"), col("o_orderdate").cast("date"),
                  col("o_orderstatus"))
          .collect() // 40 rows, fixed size at every sf — driver-side ok
          .map { r =>
            val d = r.get(1) match {
              case d: java.sql.Date => d.toLocalDate
              case d: java.time.LocalDate => d
              case other => throw new IllegalStateException(s"date cell: $other")
            }
            (r.getLong(0), d, r.getString(2))
          }
        val header = Seq("id", "d", "status")
        val export = header +: rows.toSeq.map(t => Seq[Any](t._1, t._2, t._3))
        val probes = Seq[(Long, Long, String)](
          (9000001L, 1L, "1900-01-01"), (9000002L, 59L, "1900-02-28"),
          (9000003L, 60L, "1900-02-28"), (9000004L, 61L, "1900-03-01"))
        val audit = header +: probes.map { case (id, ser, _) =>
          Seq[Any](id, Xlsx.DateSerial(ser), "probe") }
        Xlsx.writeBook(s"$xlsxDatesDirPath/export.xlsx",
          Seq("export" -> export, "audit" -> audit))
        writeFixture(xlsxDatesTsvPath,
          "sheet\tid\td\tstatus\n" +
            (probes.map { case (id, _, d) => s"audit\t$id\t$d\tprobe" } ++
             rows.map(t => s"export\t${t._1}\t${t._2}\t${t._3}"))
              .mkString("", "\n", "\n"))
        Xlsx.scanBook(s, xlsxDatesDirPath)
          .filter(col("row_idx") > 0) // drop each sheet's header row
          .select(col("sheet"),
                  col("cells").getItem(0).cast("long").as("id"),
                  col("cells").getItem(1).cast("date").as("d"),
                  col("cells").getItem(2).as("status"))
          .orderBy(col("sheet"), col("id"))
      },
      Some(s"""SELECT sheet, id, d, status
               FROM read_csv('$xlsxDatesTsvPath', delim='\t', header=true,
                             columns={'sheet': 'VARCHAR', 'id': 'BIGINT',
                                      'd': 'DATE', 'status': 'VARCHAR'})
               ORDER BY sheet, id""")),

    // Avro container-file ingest — the remaining row-interchange format
    // after TSV/CSV/JSON/xlsx/parquet/orc (Kafka dumps, sqoop-era
    // extracts arrive as .avro). No spark-avro datasource ships in this
    // image, so graft.sources.Avro decodes the container format directly
    // with the avro-core jar: binaryFile scan (file-parallel — exporters
    // emit one file per topic-partition-epoch), executor-side block
    // decode, records surfaced as Avro-canonical JSON and parsed with an
    // EXPLICIT from_json schema (the never-infer rule). The oracle TSV is
    // written independently from the same collected rows, so the hash
    // gate genuinely checks the Avro decode path: a mis-decoded deflate
    // block, wrong sync split, or field mix-up breaks it.
    "src_avro" -> Q(
      (s, dir) => {
        val rows = Tables.nation(s, dir).orderBy(col("n_nationkey"))
          .collect() // 25 rows, fixed size at every sf — driver-side ok
          .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        val schemaJson =
          """{"type":"record","name":"nation","fields":[
               {"name":"n_nationkey","type":"int"},
               {"name":"n_name","type":"string"},
               {"name":"n_regionkey","type":"int"}]}"""
        rows.groupBy(_._3).foreach { case (region, rs) =>
          Avro.write(s"$avroDirPath/nation_r$region.avro", schemaJson,
            rs.sortBy(_._1).map(t => Map[String, Any](
              "n_nationkey" -> t._1, "n_name" -> t._2, "n_regionkey" -> t._3)),
            blockRecords = 2) // force the multi-block layout real files have
        }
        writeFixture(avroTsvPath,
          "n_nationkey\tn_name\tn_regionkey\n" +
            rows.map(t => s"${t._1}\t${t._2}\t${t._3}").mkString("", "\n", "\n"))
        val st = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        Avro.scan(s, avroDirPath)
          .select(from_json(col("json"), st).as("r"))
          .select(col("r.n_nationkey"), col("r.n_name"), col("r.n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some(s"""SELECT n_nationkey, n_name, n_regionkey
               FROM read_csv('$avroTsvPath', delim='\t', header=true,
                             columns={'n_nationkey': 'INTEGER',
                                      'n_name': 'VARCHAR',
                                      'n_regionkey': 'INTEGER'})
               ORDER BY n_nationkey""")),

    // XML ingest — Spark 4's NATIVE xml datasource (spark-xml merged
    // into sql/core in 4.0), closing the last curator-export format
    // class after TSV/CSV/JSON/xlsx/avro/parquet/orc: registry exports
    // and instrument manifests arrive as XML documents. The fixture
    // exercises the features real exports use — one document per
    // region (file-parallel scan), row tag nested under a root element,
    // a key ATTRIBUTE plus child elements, entity-escaped text — and
    // the schema is EXPLICIT (rowTag + attributePrefix contract; the
    // never-infer rule). The oracle TSV is written independently from
    // the same collected rows, so a mis-bound attribute, swapped child
    // element, or unescaped entity breaks the hash gate.
    "src_xml" -> Q(
      (s, dir) => {
        val rows = Tables.nation(s, dir).orderBy(col("n_nationkey"))
          .collect() // 25 rows, fixed size at every sf — driver-side ok
          .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
        def esc(x: String) = x.replace("&", "&amp;")
          .replace("<", "&lt;").replace(">", "&gt;")
        rows.groupBy(_._3).foreach { case (region, rs) =>
          val body = rs.sortBy(_._1).map(t =>
            s"""  <nation key="${t._1}">
               |    <name>${esc(t._2)}</name>
               |    <region>${t._3}</region>
               |  </nation>""".stripMargin).mkString("\n")
          writeFixture(s"$xmlDirPath/nation_r$region.xml",
            s"<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<nations>\n$body\n</nations>\n")
        }
        writeFixture(xmlTsvPath,
          "n_nationkey\tn_name\tn_regionkey\n" +
            rows.map(t => s"${t._1}\t${t._2}\t${t._3}").mkString("", "\n", "\n"))
        val st = StructType(Seq(
          StructField("_key", IntegerType),
          StructField("name", StringType),
          StructField("region", IntegerType)))
        s.read.format("xml").schema(st)
          .option("rowTag", "nation").option("attributePrefix", "_")
          .load(xmlDirPath)
          .select(col("_key").as("n_nationkey"), col("name").as("n_name"),
                  col("region").as("n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some(s"""SELECT n_nationkey, n_name, n_regionkey
               FROM read_csv('$xmlTsvPath', delim='\t', header=true,
                             columns={'n_nationkey': 'INTEGER',
                                      'n_name': 'VARCHAR',
                                      'n_regionkey': 'INTEGER'})
               ORDER BY n_nationkey""")),

    // Nested-document emission + shredding round trip — the reference's
    // other JSON surface: metadata documents with REPEATED GROUPS (one
    // doc per entity, a nested array of its children) POSTed to the
    // registry, and the inverse normalization back into a child table.
    // Engine side does the full cycle distributed: group lineitem into
    // per-order docs (to_json over collect_list(struct)), then shred
    // them back with an explicit array<struct> schema + explode — one
    // hash shuffle to build docs, the shred itself is scan-local. The
    // oracle recomputes the child rows directly from lineitem (the
    // src_orc_roundtrip pattern), so a doc that drops/mangles a child
    // row — or a double that doesn't survive the JSON round trip —
    // breaks the hash.
    "q_json_shred" -> Q(
      (s, dir) => {
        val docs = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(to_json(collect_list(struct(
            col("l_linenumber").as("ln"), col("l_quantity").as("q")))).as("doc"))
        val itemSt = ArrayType(StructType(Seq(
          StructField("ln", IntegerType), StructField("q", DoubleType))))
        docs.select(col("l_orderkey"),
                    explode(from_json(col("doc"), itemSt)).as("item"))
          .select(col("l_orderkey"), col("item.ln").as("ln"),
                  col("item.q").as("q"))
          .orderBy(col("l_orderkey"), col("ln"))
      },
      Some("""SELECT l_orderkey, l_linenumber AS ln, l_quantity AS q
              FROM lineitem
              ORDER BY l_orderkey, ln""")),

    // BYTE-EXACT nested-document emission — the guarantee q_json_shred's
    // round trip doesn't pin: the literal JSON string a REST consumer
    // receives (the reference's registry POST payloads). Both engines
    // emit compact no-space JSON with insertion-ordered keys, so the
    // hash gate compares the serialized documents byte for byte —
    // integer/string fields only (float formatting is the one divergent
    // surface: Spark writes 1.0, DuckDB 1; doubles stay in shred-style
    // keys). Children nest sorted by line number inside one hash
    // shuffle; the doc build is scan-local after it.
    "q_json_nest" -> Q(
      (s, dir) => {
        val lines = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(struct(
            col("l_linenumber").as("ln"),
            col("l_partkey").as("part")))).as("lines"))
        Tables.orders(s, dir)
          .join(lines, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey").as("order_id"),
                  to_json(struct(col("o_orderkey").as("order_id"),
                                 col("o_orderstatus").as("status"),
                                 col("lines"))).as("doc"))
          .orderBy(col("order_id"))
      },
      Some("""WITH l AS (
                SELECT l_orderkey,
                       json('[' || string_agg(
                         CAST(json_object('ln', l_linenumber,
                                          'part', l_partkey) AS VARCHAR),
                         ',' ORDER BY l_linenumber, l_partkey) || ']')
                         AS lines
                FROM lineitem GROUP BY 1)
              SELECT o_orderkey AS order_id,
                     CAST(json_object('order_id', o_orderkey,
                                      'status', o_orderstatus,
                                      'lines', lines) AS VARCHAR) AS doc
              FROM orders JOIN l ON o_orderkey = l_orderkey
              ORDER BY order_id""")),

    // Unstructured line source — raw text ingest (log shipping, crawl
    // dumps): schema-less lines in, one string column out. The engine
    // side is spark.read.text (splittable, scan-parallel at any size);
    // the declared order is by content because a line source has no
    // inherent row identity.
    "src_text" -> Q(
      (s, dir) => {
        val path = s"$fixDir/nation_lines.txt"
        val rows = Tables.nation(s, dir).orderBy(col("n_nationkey"))
          .collect() // 25 rows, fixed size at every sf — driver-side ok
          .map(r => s"${r.getInt(0)}|${r.getString(1)}|${r.getInt(2)}")
        writeFixture(path, rows.mkString("", "\n", "\n"))
        s.read.text(path).orderBy(col("value"))
      },
      Some(s"""SELECT line AS value FROM (
                 SELECT unnest(string_split(content, chr(10))) AS line
                 FROM read_text('$fixDir/nation_lines.txt'))
               WHERE line <> ''
               ORDER BY value""")),

    // Malformed-row handling — the reference's core ingest problem:
    // curator spreadsheets with broken lines. PERMISSIVE mode parses what
    // it can and routes the rest to _corrupt_record; the declared result
    // is the VALID rows (the engine keeps the corrupt ones inspectable —
    // asserted in ScalaTest). Oracle: DuckDB's ignore_errors drops the
    // same unparseable lines.
    "src_csv_malformed" -> Q(
      (s, dir) => {
        val path = s"$fixDir/nation_malformed.tsv"
        val rows = Tables.nation(s, dir).orderBy(col("n_nationkey"))
          .collect() // 25 rows, fixed size at every sf — driver-side ok
          .map(r => s"${r.getInt(0)}\t${r.getString(1)}\t${r.getInt(2)}")
        // 3 deliberately broken lines: non-numeric key, truncated, garbage
        val broken = Seq("not_a_number\tBADLAND\t9", "99\tTRUNCATED", "###")
        writeFixture(path, "n_nationkey\tn_name\tn_regionkey\n" +
          (rows.take(10) ++ broken ++ rows.drop(10)).mkString("", "\n", "\n"))
        val st = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType),
          StructField("_corrupt_record", StringType)))
        s.read.option("sep", "\t").option("header", "true")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(st).csv(path)
          .filter(col("_corrupt_record").isNull)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .orderBy(col("n_nationkey"))
      },
      Some(s"""SELECT n_nationkey, n_name, n_regionkey
               FROM read_csv('$fixDir/nation_malformed.tsv', delim='\t',
                             header=true, ignore_errors=true,
                             columns={'n_nationkey': 'INTEGER',
                                      'n_name': 'VARCHAR',
                                      'n_regionkey': 'INTEGER'})
               ORDER BY n_nationkey""")),

    // JSON-lines metadata documents → typed columns via explicit schema.
    "src_json" -> Q(
      (s, dir) => {
        val rows = Tables.orders(s, dir)
          .orderBy(col("o_orderkey")).limit(100)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .collect()
          .map(r => s"""{"o_orderkey": ${r.getLong(0)}, "o_orderstatus": "${r.getString(1)}", "o_totalprice": ${r.getDouble(2)}}""")
        writeFixture(ordersJsonPath, rows.mkString("", "\n", "\n"))
        val st = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))
        s.read.schema(st).json(ordersJsonPath)
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM read_json('$ordersJsonPath', format='newline_delimited',
                              columns={'o_orderkey': 'BIGINT',
                                       'o_orderstatus': 'VARCHAR',
                                       'o_totalprice': 'DOUBLE'})
               ORDER BY o_orderkey""")),

    // Malformed JSON-lines handling — the robustness twin of
    // src_csv_malformed for the OTHER feed format real pipelines break
    // on (truncated uploads, concatenated fragments, type drift).
    // PERMISSIVE mode parses what it can and routes unparseable lines —
    // AND type-mismatched rows, JSON's extra failure class — to
    // _corrupt_record; the declared result is the valid rows. The oracle
    // reads an INDEPENDENTLY-written TSV of exactly those rows (manifest
    // pattern), so the corrupt-routing itself is hash-gated: a parser
    // that silently nulls a broken row into the output breaks it.
    "src_json_malformed" -> Q(
      (s, dir) => {
        val path = s"$fixDir/orders_malformed.jsonl"
        val tsv = s"$fixDir/orders_malformed.tsv"
        val rows = Tables.orders(s, dir)
          .orderBy(col("o_orderkey")).limit(100)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .collect() // bounded 100-row header sample — driver-side ok
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        val good = rows.map(t =>
          s"""{"o_orderkey": ${t._1}, "o_orderstatus": "${t._2}", "o_totalprice": ${t._3}}""")
        val broken = Seq(
          """{"o_orderkey": 1, "o_orderstatus": "O", "o_totalprice":""", // truncated
          """{"o_orderkey": "not_a_number", "o_orderstatus": "O", "o_totalprice": 1.0}""", // type drift
          """not json at all""")
        writeFixture(path,
          (good.take(50) ++ broken ++ good.drop(50)).mkString("", "\n", "\n"))
        writeFixture(tsv, "o_orderkey\to_orderstatus\to_totalprice\n" +
          rows.map(t => s"${t._1}\t${t._2}\t${t._3}").mkString("", "\n", "\n"))
        val st = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType),
          StructField("_corrupt_record", StringType)))
        s.read.option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(st).json(path)
          .filter(col("_corrupt_record").isNull)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""SELECT o_orderkey, o_orderstatus, o_totalprice
               FROM read_csv('$fixDir/orders_malformed.tsv', delim='\t',
                             header=true,
                             columns={'o_orderkey': 'BIGINT',
                                      'o_orderstatus': 'VARCHAR',
                                      'o_totalprice': 'DOUBLE'})
               ORDER BY o_orderkey""")),

    // Range-partitioned, sorted lake write: repartitionByRange +
    // sortWithinPartitions on the date key gives globally-ordered files
    // whose parquet min/max statistics make date-range scans prune whole
    // files — the sorted-lake layout for time-series at 100 TB.
    "snk_sorted" -> Q(
      (s, dir) => {
        val out = s"$fixDir/orders_sorted"
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
          .repartitionByRange(4, col("o_orderdate"), col("o_orderkey"))
          .sortWithinPartitions(col("o_orderdate"), col("o_orderkey"))
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n"), graft.H.dsum(col("o_totalprice")).as("total"))
          .orderBy(col("month"))
      },
      Some(s"""SELECT date_trunc('month', o_orderdate) AS month,
                      COUNT(*) AS n, ${graft.H.oSum("o_totalprice")} AS total
               FROM orders
               WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                 AND o_orderdate < TIMESTAMP '1998-01-01'
               GROUP BY month ORDER BY month""")),

    // ORC round-trip: the second columnar lake format Spark ships native
    // (vectorized reader, predicate pushdown). DuckDB can't read ORC, so
    // the oracle recomputes from the parquet source — the round-trip
    // equality IS the assertion.
    "src_orc_roundtrip" -> Q(
      (s, dir) => {
        val out = s"$fixDir/customer_orc"
        Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .filter(col("c_acctbal") > 5000.0)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), graft.H.dsum(col("c_acctbal")).as("total_bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n,
                      ${graft.H.oSum("c_acctbal")} AS total_bal
               FROM customer WHERE c_acctbal > 5000.0
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Schema-evolution parquet lake: two drops with different schemas in
    // one directory, read back with mergeSchema (the lake-format column-
    // add without a rewrite; missing columns null-fill).
    "src_parquet_evolved" -> Q(
      (s, dir) => {
        val out = s"$fixDir/nation_evolved"
        val n = Tables.nation(s, dir)
        n.select(col("n_nationkey"), col("n_name"))
          .write.mode("overwrite").parquet(s"$out/drop=1")
        n.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .write.mode("overwrite").parquet(s"$out/drop=2")
        s.read.option("mergeSchema", "true").parquet(out)
          .select(col("drop"), col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .orderBy(col("drop"), col("n_nationkey"))
      },
      Some(s"""SELECT * FROM (
                 SELECT 1 AS drop, n_nationkey, n_name, NULL AS n_regionkey
                 FROM nation
                 UNION ALL
                 SELECT 2 AS drop, n_nationkey, n_name, n_regionkey FROM nation)
               ORDER BY drop, n_nationkey""")),

    // CSV sink round-trip: aggregate → single-file CSV with header →
    // schema-declared read-back (the "export for the curator spreadsheet"
    // sink `[PK]`-shape). Doubles survive the text round-trip exactly
    // (shortest-repr Double.toString parses back to the same bits).
    "snk_csv_roundtrip" -> Q(
      (s, dir) => {
        val out = s"$fixDir/priority_rollup_csv"
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
               graft.H.dsum(col("o_totalprice")).as("total"))
          .coalesce(1)
          .write.mode("overwrite").option("header", "true").csv(out)
        val st = StructType(Seq(
          StructField("o_orderpriority", StringType),
          StructField("n_orders", LongType),
          StructField("total", DoubleType)))
        s.read.option("header", "true").schema(st).csv(out)
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
                      ${graft.H.oSum("o_totalprice")} AS total
               FROM orders GROUP BY o_orderpriority
               ORDER BY o_orderpriority""")),

    // JSON metadata emission + read-back — the reference's output format
    // for registered metadata documents. Doubles survive the JSON text
    // round-trip exactly (shortest-repr serialization).
    "snk_json_roundtrip" -> Q(
      (s, dir) => {
        val out = s"$fixDir/segment_report_json"
        Tables.customer(s, dir)
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_custs"),
               graft.H.dsum(col("c_acctbal")).as("total_bal"))
          .coalesce(1)
          .write.mode("overwrite").json(out)
        val st = StructType(Seq(
          StructField("c_mktsegment", StringType),
          StructField("n_custs", LongType),
          StructField("total_bal", DoubleType)))
        s.read.schema(st).json(out)
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_custs,
                      ${graft.H.oSum("c_acctbal")} AS total_bal
               FROM customer GROUP BY c_mktsegment
               ORDER BY c_mktsegment""")),

    // Partitioned lake write (the 100 TB layout) + partition-pruned read
    // back. Oracle checks the round-trip against the original table.
    "snk_partitioned" -> Q(
      (s, dir) => {
        val out = s"$fixDir/lineitem_by_flag"
        // Pre-shuffle on (partition value, salt) before partitionBy: each
        // value lands in `writers` tasks → `writers` files per value,
        // parallel writers, no committer rename storm (one task per VALUE
        // was the round-1 shape — fine for 3 values, but a skew bottleneck
        // once one value holds TBs; unsalted tasks×values small-files cost
        // 74 s at sf0.1). `writers` scales with value volume at 100 TB.
        val writers = 4
        Tables.lineitem(s, dir)
          .repartition(col("l_returnflag"), pmod(col("l_orderkey"), lit(writers)))
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        s.read.parquet(out)
          .filter(col("l_returnflag") === "R")
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus, COUNT(*) AS n
              FROM lineitem WHERE l_returnflag = 'R'
              GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Small-file compaction PLANNER — the OPTIMIZE/maintenance pass every
    // partitioned lake runs: list a fragmented layout's real files, then
    // greedily bin each partition directory's files toward a target
    // compacted size (size-descending first-fit via running-sum binning —
    // a file already at/over target lands alone in its own bin and is
    // left untouched, the true compaction semantics). The layout is a
    // REAL partitioned parquet write (deterministic row order via
    // sortWithinPartitions so file bytes reproduce); the file inventory
    // is Spark's binaryFile listing, cross-checked against an
    // INDEPENDENT java.nio directory walk written as the oracle's TSV
    // (the src_dir_manifest pattern) — the hash gate verifies both the
    // listing and the distributed binning math. Scale shape: listing is
    // metadata-only and file-parallel; the binning window partitions by
    // directory (each dir's file count is write-config bounded), so at
    // 100 TB every partition dir plans independently — no global sort,
    // no corpus data read at all.
    "q_file_compaction" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val out = s"$fixDir/compaction_layout"
        val tsv = s"$fixDir/compaction_layout.tsv"
        val target = 262144L // 256 KiB compacted-file target
        Tables.lineitem(s, dir)
          .repartition(col("l_returnflag"), pmod(col("l_orderkey"), lit(8)))
          .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
          .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
        // Independent inventory: java.nio walk, same visibility rules as
        // Spark's file index (skip _SUCCESS / hidden checksum files).
        import scala.jdk.CollectionConverters._
        val rows = Files.walk(Paths.get(out)).iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .map(p => (Paths.get(out).relativize(p).toString, Files.size(p)))
          .filter { case (rel, _) =>
            val name = rel.split('/').last
            name.endsWith(".parquet") && !name.startsWith(".") }
          .toSeq.sortBy(_._1)
        writeFixture(tsv, "relative_path\tn_bytes\n" +
          rows.map { case (r, n) => s"$r\t$n" }.mkString("", "\n", "\n"))
        val listed = s.read.format("binaryFile")
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet")
          .load(out)
          .select(
            regexp_extract(col("path"), "compaction_layout/([^/]*)/[^/]*$", 1)
              .as("part_dir"),
            regexp_extract(col("path"), "([^/]*)$", 1).as("fname"),
            col("length").as("n_bytes"))
        val w = Window.partitionBy(col("part_dir"))
          .orderBy(col("n_bytes").desc, col("fname"))
          .rowsBetween(Window.unboundedPreceding, -1)
        listed
          .withColumn("cum_before", coalesce(sum(col("n_bytes")).over(w), lit(0L)))
          .withColumn("bin", expr(s"cum_before div ${target}L"))
          .groupBy(col("part_dir"), col("bin"))
          .agg(count(lit(1)).as("n_files"),
               sum(col("n_bytes")).as("bin_bytes"))
          .orderBy(col("part_dir"), col("bin"))
      },
      Some(s"""WITH f AS (
                 SELECT string_split(relative_path, '/')[1] AS part_dir,
                        string_split(relative_path, '/')[-1] AS fname,
                        n_bytes
                 FROM read_csv('${graft.Fixtures.dir}/compaction_layout.tsv',
                               delim='\t', header=true,
                               columns={'relative_path': 'VARCHAR',
                                        'n_bytes': 'BIGINT'})),
                b AS (SELECT part_dir, fname, n_bytes,
                             CAST(COALESCE(SUM(n_bytes) OVER (
                               PARTITION BY part_dir
                               ORDER BY n_bytes DESC, fname
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS BIGINT)
                               AS cum_before
                      FROM f)
               SELECT part_dir, cum_before // 262144 AS bin,
                      COUNT(*) AS n_files,
                      CAST(SUM(n_bytes) AS BIGINT) AS bin_bytes
               FROM b GROUP BY 1, 2
               ORDER BY part_dir, bin""")),

    // Partition PRUNING on read — the other half of the partitioned-lake
    // story (snk_partitioned is the write): a layout partitioned by a
    // predicate column turns the filter into directory selection, so the
    // scan never opens the other partitions' files at all. The layout is
    // written once per data dir (same amortized-layout contract as
    // q_join_bucketed); the DECLARED query is the pruned read.
    // PlanAuditSpec pins PartitionFilters in the scan node — at 100 TB
    // this is the difference between reading one lang's TBs and all of
    // them. Oracle recomputes from the unpartitioned source.
    "src_partition_pruning" -> Q(
      (s, dir) => {
        val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
        val out = s"$fixDir/docs_by_lang_$tag"
        val done = new java.io.File(s"$out/_SUCCESS")
        if (!done.exists()) {
          Tables.documents(s, dir)
            .repartition(col("lang"))
            .write.mode("overwrite").partitionBy("lang").parquet(out)
        }
        s.read.parquet(out)
          .filter(col("lang") === "en")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars
              FROM documents WHERE lang = 'en'
              GROUP BY source ORDER BY source""")),

    // Directory-walk file manifest — the reference's "walk dataset
    // directories, build file manifests with sizes and checksums" ingest
    // step (SURVEY §0.1), the one capability class with no key through
    // round 5. Spark-native shape: the binaryFile source with
    // recursiveFileLookup walks the tree in a distributed scan — one task
    // per file group, no driver-side os.walk — and sha2(content, 256)
    // checksums ride the same pass (a checksum manifest must read every
    // byte no matter the engine, so the job is file-parallel by
    // construction; a size-only manifest would instead read just the
    // listing — `length` comes from file status, not content). binaryFile
    // files are non-splittable, which is exactly right for whole-file
    // digests. The fixture tree (25 files across 5 region dirs, fixed at
    // every sf) is written deterministically each run; the oracle reads a
    // manifest TSV whose sizes/digests are computed INDEPENDENTLY via
    // java.security.MessageDigest at write time — a genuine cross-check
    // of Spark's scan+sha2 against a second implementation.
    "src_dir_manifest" -> Q(
      (s, dir) => {
        val manifest = writeManifestTree(s, dir, manifestTreePath, v2 = false)
        writeFixture(manifestTsvPath, manifestTsv(manifest))
        s.read.format("binaryFile")
          .option("recursiveFileLookup", "true")
          .load(manifestTreePath)
          .select(
            regexp_extract(col("path"), "manifest_tree/(.*)$", 1)
              .as("relative_path"),
            col("length").as("n_bytes"),
            sha2(col("content"), 256).as("sha256"))
          .orderBy(col("relative_path"))
      },
      Some(s"""SELECT relative_path, n_bytes, sha256
               FROM read_csv('$manifestTsvPath', delim='\t', header=true,
                             columns={'relative_path': 'VARCHAR',
                                      'n_bytes': 'BIGINT',
                                      'sha256': 'VARCHAR'})
               ORDER BY relative_path""")),

    // Manifest drift report — the reference's walk-then-diff validation
    // workflow (§3.1 archetype 2+3 composed): two dataset snapshots in,
    // per-file added/removed/changed/unchanged out. Engine shape: two
    // file-parallel binaryFile scans, one path-keyed full-outer hash join
    // — content never co-locates, only (path, size, sha) rows shuffle. At
    // real scale the manifests would be PERSISTED once per snapshot (the
    // src_dir_manifest output) and the diff joins manifest parquet —
    // metadata-sized, which is exactly what the TSV oracle models. The v2
    // drift is deterministic (drop %7, revise %5, add 3), so every status
    // appears and the oracle pins each row.
    "src_manifest_diff" -> Q(
      (s, dir) => {
        val m1 = writeManifestTree(s, dir, manifestTreePath, v2 = false)
        val m2 = writeManifestTree(s, dir, manifestTree2Path, v2 = true)
        writeFixture(manifestTsvPath, manifestTsv(m1))
        writeFixture(manifestTsv2Path, manifestTsv(m2))
        def scan(root: String, seg: String, tag: String) =
          s.read.format("binaryFile")
            .option("recursiveFileLookup", "true").load(root)
            .select(
              regexp_extract(col("path"), seg + "/(.*)$", 1).as("relative_path"),
              col("length").as(s"bytes_$tag"),
              sha2(col("content"), 256).as(s"sha_$tag"))
        val a = scan(manifestTreePath, "manifest_tree", "v1")
        val b = scan(manifestTree2Path, "manifest_tree_v2", "v2")
        a.join(b, Seq("relative_path"), "full")
          .select(col("relative_path"),
            when(col("sha_v1").isNull, "added")
              .when(col("sha_v2").isNull, "removed")
              .when(col("sha_v1") =!= col("sha_v2"), "changed")
              .otherwise("unchanged").as("status"),
            coalesce(col("bytes_v1"), lit(-1L)).as("bytes_v1"),
            coalesce(col("bytes_v2"), lit(-1L)).as("bytes_v2"))
          .orderBy(col("relative_path"))
      },
      Some(s"""WITH a AS (SELECT * FROM read_csv('$manifestTsvPath',
                            delim='\t', header=true,
                            columns={'relative_path': 'VARCHAR',
                                     'n_bytes': 'BIGINT',
                                     'sha256': 'VARCHAR'})),
                    b AS (SELECT * FROM read_csv('$manifestTsv2Path',
                            delim='\t', header=true,
                            columns={'relative_path': 'VARCHAR',
                                     'n_bytes': 'BIGINT',
                                     'sha256': 'VARCHAR'}))
               SELECT COALESCE(a.relative_path, b.relative_path) AS relative_path,
                      CASE WHEN a.sha256 IS NULL THEN 'added'
                           WHEN b.sha256 IS NULL THEN 'removed'
                           WHEN a.sha256 <> b.sha256 THEN 'changed'
                           ELSE 'unchanged' END AS status,
                      COALESCE(a.n_bytes, -1) AS bytes_v1,
                      COALESCE(b.n_bytes, -1) AS bytes_v2
               FROM a FULL JOIN b ON a.relative_path = b.relative_path
               ORDER BY relative_path"""))
  ) ++ qs2

    // Fixed-width text ingest — the mainframe/legacy-export format
    // (COBOL copybooks, bank feeds) that still shows up in curator drop
    // folders. Round trip both ways DISTRIBUTED: render each customer
    // row to a 34-char fixed layout (%10d key | %-12s segment | %12.2f
    // balance) with format_string and write via the text sink (no
    // driver-side collect — this is how a 100 TB export would run),
    // then re-ingest with spark.read.text + positional substring/cast
    // parsing. The balance survives as CAST(printf('%.2f')) on both
    // sides — strtod is correctly rounded in both engines, so the
    // parsed double is bit-identical to the oracle's. Field overflow
    // (a >12-char segment) would shift columns — the layout constants
    // are sized to the fixture domain and a production copybook reader
    // validates line length, as the length gate does here.
  private lazy val qs2: Seq[(String, Q)] = Seq(
    "src_fixed_width" -> Q(
      (s, dir) => {
        val out = s"$fixDir/customer_fixed_width"
        Tables.customer(s, dir)
          .select(format_string("%10d%-12s%12.2f",
                    col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
                  .as("value"))
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .filter(length(col("value")) === 34) // copybook line-length gate
          .select(
            substring(col("value"), 1, 10).cast("long").as("c_custkey"),
            trim(substring(col("value"), 11, 12)).as("c_mktsegment"),
            substring(col("value"), 23, 12).cast("double").as("bal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
                     CAST(printf('%.2f', c_acctbal) AS DOUBLE) AS bal
              FROM customer ORDER BY c_custkey""")),

    // The same fixed-width feed through the CUSTOM DataSourceV2 reader
    // (FixedWidth.scala): layout-declared schema, column pruning (the
    // segment field is never sliced — only 2 of 3 fields parse), and
    // GreaterThan pushdown evaluated on the raw slice inside the reader
    // (the scan emits only surviving lines; Spark drops its copy of the
    // pushed predicate). The V2 path is what a production copybook
    // format would ship; src_fixed_width keeps the compose-built-ins
    // twin. Pushdown reaching the scan is plan-audited.
    "src_fixed_width_pushdown" -> Q(
      (s, dir) => {
        val out = s"$fixDir/customer_fixed_width"
        Tables.customer(s, dir)
          .select(format_string("%10d%-12s%12.2f",
                    col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
                  .as("value"))
          .write.mode("overwrite").text(out)
        s.read.format("graft.sources.FixedWidthSource")
          .option("layout",
            "c_custkey:1:10:long,c_mktsegment:11:12:string,bal:23:12:double")
          .load(out)
          .filter(col("bal") > 5000.0)
          .select(col("c_custkey"), col("bal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
                     CAST(printf('%.2f', c_acctbal) AS DOUBLE) AS bal
              FROM customer
              WHERE CAST(printf('%.2f', c_acctbal) AS DOUBLE) > 5000.0
              ORDER BY c_custkey"""))
  )
}
