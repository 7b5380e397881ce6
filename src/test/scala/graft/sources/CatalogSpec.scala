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
}
