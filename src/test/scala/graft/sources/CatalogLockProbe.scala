package graft.sources

/** Child-PROCESS worker for CatalogSpec's cross-process writer test
  * (r14 VERDICT #8: the serialized-writer lock and WAL recovery were
  * tested in-JVM only — prove the OS advisory lock excludes a SECOND
  * process, not just a second thread).
  *
  * Modes:
  *  - `hold <dir> <ms>`: acquire the catalog's sidecar `.catalog.lock`
  *    exactly as Catalog.mutate does, print `LOCKED` (the parent's
  *    timing anchor), hold for `ms`, release, exit 0.
  *  - `race <dir> <n> <tag>`: perform n real Catalog.register mutations
  *    (distinct names) against the same catalog dir the parent is
  *    concurrently mutating, exit 0.
  *
  * Catalog is filesystem-only (no SparkSession), so the child needs just
  * the test classpath — the parent spawns `java -cp <own classpath>`. */
object CatalogLockProbe {
  def main(args: Array[String]): Unit = args(0) match {
    case "hold" =>
      val dir = java.nio.file.Paths.get(args(1))
      val ms = args(2).toLong
      java.nio.file.Files.createDirectories(dir)
      val ch = java.nio.channels.FileChannel.open(
        dir.resolve(".catalog.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock()
        try {
          println("LOCKED")
          System.out.flush()
          Thread.sleep(ms)
        } finally lk.release()
      } finally ch.close()
    case "race" =>
      val dir = args(1); val n = args(2).toInt; val tag = args(3)
      (0 until n).foreach { i =>
        Catalog.register(dir, Seq(
          Catalog.Entry(s"t_${tag}_$i", "parquet", s"/data/$tag/$i", Nil)))
        Thread.sleep(20) // widen the interleaving window with the parent
      }
    case other => sys.error(s"unknown mode: $other")
  }
}
