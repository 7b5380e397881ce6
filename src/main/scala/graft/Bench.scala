package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed CPU+IO contention probe — measures the HOST, not the engine.
    * Run immediately before and after the timed loop; when either
    * reading deviates >2x from the floor recorded in BASELINE.md
    * ("sentinel floor"), the capture is FLAGGED: adjudicate it with the
    * per-key gate vs recorded floors and discard only when the gate
    * breaches too (r9: a contended capture read as a 4.5x gate fail
    * while the idle-host suite was actually faster than the round
    * before; r10 afternoon: the IO leg alone ran 2-3x floor host-wide
    * while every per-key time sat AT floor). The two legs time
    * separately since r10 so that split is visible in the artifact:
    * `cpu` = a 50M-row parallel aggregate through the same engine
    * (CPU/scheduler contention shows here); `io` = a 100 MB tmp-file
    * write+read+delete (disk/page-cache contention shows here — and
    * only matters for the scan/sink-bound keys). */
  private def sentinel(spark: SparkSession): (Double, Double) = {
    val t0 = System.nanoTime()
    spark.range(50000000L).selectExpr("sum(id * 3 + 1)").collect()
    val tCpu = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val buf = new Array[Byte](1 << 20)
    java.util.Arrays.fill(buf, 42.toByte)
    val p = java.nio.file.Files.createTempFile("graft-sentinel", ".bin")
    try {
      val out = java.nio.file.Files.newOutputStream(p)
      var i = 0; while (i < 100) { out.write(buf); i += 1 }
      out.close()
      val in = java.nio.file.Files.newInputStream(p)
      var r = in.read(buf)
      while (r > 0) { r = in.read(buf) }
      in.close()
    } finally java.nio.file.Files.deleteIfExists(p)
    (tCpu, (System.nanoTime() - t1) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session/JIT/codegen spin-up and parquet footer reads
    // would otherwise all land on whichever query happens to run first.
    // Deliberately NOT df.cache(): measured 34.4 s → 71.2 s at sf0.1 —
    // InMemoryRelation deserialization loses to the vectorized parquet
    // reader on every scan-heavy query here (OS page cache already holds
    // the bytes after this warmup).
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.configure(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // Representative untimed warmup: a broadcast join, a window, and an
    // HOF/codegen-heavy query, so whole-stage-codegen compilation, the
    // broadcast machinery, and WindowExec don't all land on whichever key
    // sorts first alphabetically (r2: llm_dedup_simhash absorbed them and
    // read 2-5x its steady-state time in first-slot runs).
    Seq("q_join_broadcast", "q_win_topn_group", "fn_array", "llm_text_stats")
      .flatMap(SparkEntry.queries.get)
      .foreach { fn => try fn(spark, sfDir).count()
                       catch { case _: Throwable => () } }
    // Shared pipeline-stage builds run BEFORE the timed per-key loop and
    // report as their own stage:<name> line items: the write-once/read-
    // many stages (shingles → near_pairs → cluster_labels) otherwise land
    // entirely on the alphabetically-first consumer, making its per-key
    // floor read ~2× its real cost while every sibling reads near-zero
    // (r8 gate breach on llm_dedup_cluster — cost relocation, not
    // regression). Consumers now time what a consumer does: read the
    // materialized stage.
    val stageResults = graft.llm.Stages.warm(spark, sfDir)
    // Contention sentinel: bracket the timed loop with the fixed probe so
    // the artifact self-adjudicates (see [[sentinel]]). Placed after every
    // warmup so the range plan's codegen is already compiled — the probe
    // must time the host, not first-use JIT.
    val (sentinelPreCpu, sentinelPreIo) = sentinel(spark)
    val sentinelPre = sentinelPreCpu + sentinelPreIo
    // Optional local-iteration filter (driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val queryResults = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // failures must be LOUD on stderr (stdout stays parseable JSON): a
      // swallowed exception reads as an impossibly-fast key and poisons
      // the per-key minima (r9: llm_dedup_cluster "0.004 s" was a crash)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
        -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val (sentinelPostCpu, sentinelPostIo) = sentinel(spark)
    val sentinelPost = sentinelPostCpu + sentinelPostIo
    // total stays Σ(all line items) — stage builds are paid work, just
    // charged to their own keys instead of the first consumer
    val results = stageResults ++ queryResults
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // sentinel_s = the worse of the two brackets (contention any time
    // during the run invalidates the capture); pre/post kept so a reader
    // can see WHEN the load arrived. Floor recorded in BASELINE.md
    // ("sentinel floor"); >2x floor ⇒ discard and re-run.
    val sentinelJson =
      f""""sentinel_s":${math.max(sentinelPre, sentinelPost)}%.3f,"sentinel_pre_s":$sentinelPre%.3f,"sentinel_post_s":$sentinelPost%.3f,""" +
      f""""sentinel_cpu_s":${math.max(sentinelPreCpu, sentinelPostCpu)}%.3f,"sentinel_io_s":${math.max(sentinelPreIo, sentinelPostIo)}%.3f"""
    // Full per-query line first: input for scripts/bench_minima.py and any
    // consumer that reads the whole stdout.
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec",$sentinelJson,"queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // The harness tail-parses this process's stdout, but sbt prefixes every
    // line with "[info] " and appends a trailing "[success] Total time…"
    // line, so the snapshot's last line is never bare JSON (BENCH_r1–r5 all
    // landed parsed:null). Persist the full line to a repo file as well —
    // scripts/bench_minima.py and the judge read the file when the stdout
    // artifact fails to parse. Relative to the working directory (sbt runs
    // from the project root), so any checkout location gets the artifact
    // next to its own BASELINE.md. Best-effort, but LOUD on failure: a
    // read-only checkout must not fail the bench itself, yet a silently
    // missing artifact defeats the file's purpose. A FILTERED run
    // (SPARK_GRAFT_ONLY — local iteration, scale_check's two-sf probes)
    // is never round-canonical, so it must not clobber the full-suite
    // capture: that is exactly how the committed artifact twice ended up
    // holding a handful-of-keys sf1 probe in violation of the BASELINE
    // convention that BENCH_LOCAL mirrors the round capture.
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_LOCAL.json"), full + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] WARN: could not write BENCH_LOCAL.json: $e") }
    } else System.err.println(
      "[bench] filtered run (SPARK_GRAFT_ONLY): BENCH_LOCAL.json left untouched")
    // The harness that snapshots this run keeps only the LAST ~2000 chars
    // of stdout; with 140+ keys the full line above starts outside that
    // window and can never parse from the tail. Emit a final compact line
    // that is guaranteed to fit: 3-decimal values, slowest keys first,
    // truncated to a 1600-char budget, with n_queries recording the
    // full-suite cardinality the total covers.
    val parts = results.sortBy(-_._2)
      .map { case (k, v) => f""""$k":$v%.3f""" }
    var used = 0
    val kept = parts.takeWhile { p => used += p.length + 1; used <= 1600 }
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec",$sentinelJson%s,"n_queries":${results.size},"queries":${kept.mkString("{", ",", "}")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
