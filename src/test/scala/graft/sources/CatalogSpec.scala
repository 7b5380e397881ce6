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
