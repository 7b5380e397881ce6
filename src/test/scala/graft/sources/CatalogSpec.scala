package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the file-backed catalog's persistence contract: deterministic
  * bytes, last-writer-wins merge, partition-column round-trip, and
  * resolution from a session that never saw the registration. */
class CatalogSpec extends AnyFunSuite with graft.SparkSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cat").toString

  test("register is idempotent and merge is last-writer-wins per name") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(
      Catalog.Entry("a", "parquet", "/data/a", Seq("dt")),
      Catalog.Entry("b", "csv", "/data/b", Nil)))
    val bytes1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tables.jsonl"))
    // same registration again → identical bytes
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/data/a", Seq("dt"))))
    val bytes2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tables.jsonl"))
    assert(java.util.Arrays.equals(bytes1, bytes2))
    // replace a's path; b survives, order stays name-sorted
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/data/a2", Nil)))
    val loaded = Catalog.load(dir)
    assert(loaded.map(_.name) == Seq("a", "b"))
    assert(loaded.head.path == "/data/a2" && loaded.head.partitionCols.isEmpty)
    assert(loaded(1).format == "csv")
  }

  test("concurrent writers: N threads registering distinct names all survive") {
    // Pins r11 VERDICT #5: the pre-r12 unserialized read-modify-write
    // lost updates under exactly this shape (two sessions publishing
    // concurrently). 16 threads × 8 tables each, one register per table.
    val dir = tmpDir()
    val threads = (0 until 16).map { t =>
      new Thread(() => (0 until 8).foreach { i =>
        Catalog.register(dir, Seq(
          Catalog.Entry(f"t${t}%02d_$i", "parquet", s"/data/$t/$i", Nil)))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val loaded = Catalog.load(dir)
    assert(loaded.size == 128, s"lost updates: ${128 - loaded.size} entries dropped")
    assert(loaded.map(_.name) == loaded.map(_.name).sorted)
  }

  test("concurrent REPLACE of the same name: last-writer-wins, never torn") {
    val dir = tmpDir()
    val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 20).foreach { i =>
        val p = s"/data/v$t-$i"; paths.add(p)
        Catalog.register(dir, Seq(Catalog.Entry("hot", "parquet", p, Nil)))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val loaded = Catalog.load(dir) // parses ⇒ never torn
    assert(loaded.size == 1 && loaded.head.name == "hot")
    assert(paths.contains(loaded.head.path)) // one of the writes, atomically
  }

  test("drop removes the name only; reset empties; both are metadata-only") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(
      Catalog.Entry("keep", "parquet", "/data/keep", Nil),
      Catalog.Entry("gone", "csv", "/data/gone", Nil)))
    assert(Catalog.drop(dir, "gone"))
    assert(!Catalog.drop(dir, "gone")) // second drop: already absent
    assert(!Catalog.drop(dir, "never_existed"))
    assert(Catalog.load(dir).map(_.name) == Seq("keep"))
    Catalog.reset(dir)
    assert(Catalog.load(dir).isEmpty)
  }

  test("load on a missing catalog is empty, not an error") {
    assert(Catalog.load(tmpDir() + "/nope").isEmpty)
  }

  test("time travel: replace-then-asof resolves each version's binding") {
    // Pins r12 VERDICT #6: v1 register, v2 replace + new name, v3 drop —
    // asOf(v) must replay to exactly that version's state, asOf beyond
    // current returns current, asOf(0) is empty.
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("t", "parquet", "/d/v1", Nil)))
    Catalog.register(dir, Seq(
      Catalog.Entry("t", "parquet", "/d/v2", Seq("dt")),
      Catalog.Entry("u", "csv", "/d/u", Nil)))
    Catalog.drop(dir, "t")
    assert(Catalog.currentVersion(dir) == 3)
    assert(Catalog.asOf(dir, 0).isEmpty)
    assert(Catalog.asOf(dir, 1).map(e => (e.name, e.path)) == Seq(("t", "/d/v1")))
    val v2 = Catalog.asOf(dir, 2)
    assert(v2.map(_.name) == Seq("t", "u"))
    assert(v2.head.path == "/d/v2" && v2.head.partitionCols == Seq("dt"))
    assert(Catalog.asOf(dir, 3).map(_.name) == Seq("u")) // tombstone landed
    assert(Catalog.asOf(dir, 99) == Catalog.load(dir))   // future = current
  }

  test("time travel: no-op mutations burn no version; ts as-of resolves") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a", Nil)))
    val v1 = Catalog.currentVersion(dir)
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a", Nil)))
    assert(Catalog.currentVersion(dir) == v1, "idempotent re-register bumped the version")
    assert(!Catalog.drop(dir, "nope"))
    assert(Catalog.currentVersion(dir) == v1, "missing-name drop bumped the version")
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a2", Nil)))
    val hist = Catalog.loadHistory(dir)
    assert(hist.map(_.version) == Seq(1L, 2L))
    // timestamp-based as-of: before the first binding → empty; at/after
    // each binding's recorded ts → that version's state (fixed-width ts
    // makes string compare chronological)
    assert(Catalog.asOfTimestamp(dir, "1970-01-01T00:00:00.000Z").isEmpty)
    assert(Catalog.asOfTimestamp(dir, hist.head.ts).nonEmpty)
    assert(Catalog.asOfTimestamp(dir, "9999-12-31T23:59:59.999Z")
             .head.path == "/d/a2")
  }

  test("time travel: openAsOf reads the historical data, resetAll clears history") {
    val dir = tmpDir()
    val data = java.nio.file.Files.createTempDirectory("graft-cat-tt").toString
    import spark.implicits._
    Seq((1, "old")).toDF("k", "v").write.parquet(s"$data/t1.parquet")
    Seq((2, "new"), (3, "new")).toDF("k", "v").write.parquet(s"$data/t2.parquet")
    Catalog.register(dir, Seq(Catalog.Entry("t", "parquet", s"$data/t1.parquet", Nil)))
    Catalog.register(dir, Seq(Catalog.Entry("t", "parquet", s"$data/t2.parquet", Nil)))
    val s2 = spark.newSession()
    assert(Catalog.openAsOf(s2, dir, "t", 1).count() == 1)
    assert(Catalog.openAsOf(s2, dir, "t", 2).count() == 2)
    intercept[NoSuchElementException] { Catalog.openAsOf(s2, dir, "t", 0) }
    Catalog.resetAll(dir)
    assert(Catalog.load(dir).isEmpty && Catalog.loadHistory(dir).isEmpty)
    assert(Catalog.currentVersion(dir) == 0)
  }

  test("time travel: compact folds pre-horizon history into a checkpoint, replay above unchanged") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a1", Nil))) // v1
    Catalog.register(dir, Seq(Catalog.Entry("b", "csv", "/d/b", Nil)))      // v2
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a2", Nil))) // v3
    Catalog.drop(dir, "b")                                                  // v4
    Catalog.register(dir, Seq(Catalog.Entry("c", "json", "/d/c", Nil)))     // v5
    val before = (3L to 5L).map(v => Catalog.asOf(dir, v))
    val tsBefore = Catalog.loadHistory(dir).map(b => b.entry.name -> b.ts).toMap
    val horizon = Catalog.compact(dir, keepVersions = 3) // keep v3..v5
    assert(horizon == 3)
    // replay at and above the horizon is bit-identical
    assert((3L to 5L).map(v => Catalog.asOf(dir, v)) == before)
    assert(Catalog.asOf(dir, 99) == Catalog.load(dir))
    // the checkpoint re-emits horizon state as puts at v3 with ORIGINAL ts
    val hist = Catalog.loadHistory(dir)
    assert(hist.head.version == 3 && hist.map(_.version).distinct == Seq(3L, 4L, 5L))
    val ckptA = hist.find(b => b.version == 3 && b.entry.name == "a").get
    assert(ckptA.ts == tsBefore("a"), "compaction re-stamped history")
    // below the horizon = vacuumed, an error — not a silently-empty catalog
    intercept[NoSuchElementException] { Catalog.asOf(dir, 2) }
    // nothing to compact → 0, log untouched
    assert(Catalog.compact(dir, keepVersions = 10) == 0L)
    assert(Catalog.loadHistory(dir) == hist)
  }

  test("crash-consistency: stray tmp files from a pre-rename crash are " +
       "invisible to readers and writers (r14 VERDICT #7)") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a", Nil)))
    // a writer died after writing its temp files but before either rename
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".tables-deadbeef.tmp"), "{\"torn")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".history-deadbeef.tmp"), "{\"torn")
    assert(Catalog.load(dir).map(_.name) == Seq("a"))
    assert(Catalog.loadHistory(dir).map(_.version) == Seq(1L))
    Catalog.register(dir, Seq(Catalog.Entry("b", "csv", "/d/b", Nil)))
    assert(Catalog.load(dir).map(_.name) == Seq("a", "b"))
    assert(Catalog.currentVersion(dir) == 2)
  }

  test("crash-consistency: a writer dying between the history rename and " +
       "the tables rename loses nothing — readers see a complete state, " +
       "as-of sees the acknowledged version, and the next mutation " +
       "re-checkpoints the WAL suffix (r14 VERDICT #7)") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a", Nil))) // v1
    val tablesV1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "tables.jsonl"))
    Catalog.register(dir, Seq(Catalog.Entry("b", "csv", "/d/b", Nil)))     // v2
    // simulate the crash: history already carries v2, but the tables
    // checkpoint rename never happened — roll tables.jsonl back to v1
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "tables.jsonl"), tablesV1)
    // readers: complete (stale) state, never torn
    assert(Catalog.load(dir).map(_.name) == Seq("a"))
    // time travel: the acknowledged WAL version resolves
    assert(Catalog.currentVersion(dir) == 2)
    assert(Catalog.asOf(dir, 2).map(_.name) == Seq("a", "b"))
    // the next mutation recovers the WAL suffix instead of building on
    // the stale checkpoint (which would silently drop b from the state
    // while history still replays it — permanent divergence)
    Catalog.register(dir, Seq(Catalog.Entry("c", "json", "/d/c", Nil)))    // v3
    assert(Catalog.load(dir).map(_.name) == Seq("a", "b", "c"))
    assert(Catalog.currentVersion(dir) == 3)
    assert(Catalog.asOf(dir, 3) == Catalog.load(dir))
    // versions were never renumbered
    assert(Catalog.loadHistory(dir).map(_.version).distinct == Seq(1L, 2L, 3L))
  }

  test("compact to an EMPTY horizon state keeps the version line alive " +
       "via the horizon marker (r14, ADVICE)") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a", Nil))) // v1
    assert(Catalog.drop(dir, "a"))                                          // v2
    val horizon = Catalog.compact(dir, keepVersions = 1)
    assert(horizon == 2)
    // the rewritten log is NOT empty: the marker holds the version line
    assert(Catalog.currentVersion(dir) == 2)
    assert(Catalog.asOf(dir, 2).isEmpty)
    intercept[NoSuchElementException] { Catalog.asOf(dir, 1) } // vacuumed
    // versions are never re-issued: the next mutation is v3, not v1
    Catalog.register(dir, Seq(Catalog.Entry("b", "csv", "/d/b", Nil)))
    assert(Catalog.currentVersion(dir) == 3)
    assert(Catalog.asOf(dir, 3).map(_.name) == Seq("b"))
  }

  test("loadHistory fails loudly on a corrupted binding line (r14, ADVICE)") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("a", "parquet", "/d/a", Nil)))
    val hf = java.nio.file.Paths.get(dir, "history.jsonl")
    java.nio.file.Files.writeString(hf,
      java.nio.file.Files.readString(hf) + "{\"v\":2,\"op\":\"putx\" GARBAGE\n")
    val e = intercept[IllegalStateException] { Catalog.loadHistory(dir) }
    assert(e.getMessage.contains("corrupted"))
  }

  test("open/attach resolve from a session that never registered anything") {
    val dir = tmpDir()
    val data = java.nio.file.Files.createTempDirectory("graft-cat-data").toString
    import spark.implicits._
    Seq((1, "x"), (2, "y")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$data/t.parquet")
    Catalog.register(dir, Seq(
      Catalog.Entry("cat_t", "parquet", s"$data/t.parquet", Nil)))
    val s2 = spark.newSession() // fresh state: no views, no conf
    assert(Catalog.open(s2, dir, "cat_t").count() == 2)
    Catalog.attach(s2, dir)
    assert(s2.sql("SELECT sum(k) FROM cat_t").collect()(0).getLong(0) == 3L)
    // the registering session's views were never touched
    assert(!spark.catalog.tableExists("cat_t"))
    intercept[NoSuchElementException] { Catalog.open(s2, dir, "missing") }
  }

  // ---- cross-PROCESS writer evidence (r14 VERDICT #8) -------------------
  // The in-JVM monitor is covered above; these two spawn a real second
  // JVM (CatalogLockProbe on this suite's own classpath — Catalog is
  // filesystem-only, no SparkSession) to prove the OS advisory lock on
  // .catalog.lock is what excludes a second PROCESS.

  private def spawnProbe(args: String*): Process = {
    val jvm = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    new ProcessBuilder(
      (Seq(jvm, "-cp", sys.props("java.class.path"),
           "graft.sources.CatalogLockProbe") ++ args): _*)
      .redirectErrorStream(true).start()
  }

  test("a mutate BLOCKS while a second process holds the catalog lock") {
    val dir = tmpDir()
    Catalog.register(dir, Seq(Catalog.Entry("seed", "parquet", "/d/0", Nil)))
    val holdMs = 2500L
    val proc = spawnProbe("hold", dir, holdMs.toString)
    try {
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      val line = rd.readLine() // blocks until the child owns the lock
      assert(line == "LOCKED", s"probe failed to acquire: $line")
      val t0 = System.nanoTime()
      Catalog.register(dir, Seq(Catalog.Entry("blocked", "parquet", "/d/1", Nil)))
      val waitedMs = (System.nanoTime() - t0) / 1e6
      // an unenforced lock returns in single-digit ms; generous slack for
      // the LOCKED-print-to-readLine latency eating into the hold window
      assert(waitedMs >= 1000,
        s"register returned after ${waitedMs}ms while another process " +
          s"held .catalog.lock for ${holdMs}ms — the OS lock is not excluding")
      assert(Catalog.load(dir).map(_.name).contains("blocked"))
    } finally { proc.destroyForcibly(); () }
  }

  test("two processes mutating concurrently lose no update and burn " +
       "exactly one version each") {
    val dir = tmpDir()
    val n = 12
    val proc = spawnProbe("race", dir, n.toString, "child")
    try {
      (0 until n).foreach { i =>
        Catalog.register(dir, Seq(
          Catalog.Entry(s"t_parent_$i", "parquet", s"/data/parent/$i", Nil)))
        Thread.sleep(20)
      }
      val out = new String(proc.getInputStream.readAllBytes())
      assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child process did not finish")
      assert(proc.exitValue == 0, s"child failed:\n$out")
      val names = Catalog.load(dir).map(_.name)
      // the r11 lost-update shape: A and B both read, both merge, second
      // rename silently drops the first's entry
      assert(names.size == 2 * n && names.distinct.size == 2 * n,
        s"expected ${2 * n} surviving entries, got ${names.size}: $names")
      // every mutation was a distinct effective change → exactly one
      // version each, gapless (a gap or duplicate = torn interleaving)
      val vs = Catalog.loadHistory(dir).map(_.version)
      assert(vs == (1L to 2L * n),
        s"history versions not gapless 1..${2 * n}: $vs")
    } finally { proc.destroyForcibly(); () }
  }
}
