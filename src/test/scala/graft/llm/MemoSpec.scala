package graft.llm

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Pins the r10 Memo contract: stage builds for DIFFERENT keys run
  * CONCURRENTLY (the r9 global `synchronized` serialized every build in
  * the JVM), while each key still computes exactly once and nested stage
  * entry from inside a compute (llm_dedup_cluster's shape) stays safe. */
class MemoSpec extends graft.SparkSuite {

  test("per-key latch: two distinct-key builds overlap, nest, and compute once") {
    // Unique stage names per invocation: the memo is JVM-wide, and a
    // rerun in a warm sbt session must not hit the previous run's entry.
    val id = java.util.UUID.randomUUID().toString.take(8)
    val nA = new AtomicInteger(0)
    val nB = new AtomicInteger(0)
    // Both computes must be IN FLIGHT at the same instant — under a
    // global lock this latch can never open and both threads time out,
    // which is exactly the serialization regression being pinned.
    val bothEntered = new CountDownLatch(2)

    def stageA() = Memo.stage(spark, sf, s"memospec_a_$id") {
      nA.incrementAndGet()
      bothEntered.countDown()
      assert(bothEntered.await(30, TimeUnit.SECONDS),
        "stage B's build never started while A held its latch — builds are serialized")
      spark.range(5).toDF("id").localCheckpoint(true)
    }
    // B's compute ENTERS THE MEMO for A — the nested-entry shape that
    // crashed ConcurrentHashMap.computeIfAbsent ("Recursive update", r9).
    def stageB() = Memo.stage(spark, sf, s"memospec_b_$id") {
      nB.incrementAndGet()
      bothEntered.countDown()
      assert(bothEntered.await(30, TimeUnit.SECONDS),
        "stage A's build never started while B held its latch — builds are serialized")
      stageA().selectExpr("id * 2 AS id").localCheckpoint(true)
    }

    @volatile var err: Throwable = null
    val tA = new Thread(() => try stageA() catch { case e: Throwable => err = e })
    val tB = new Thread(() => try stageB() catch { case e: Throwable => err = e })
    tA.start(); tB.start()
    tA.join(60000); tB.join(60000)
    assert(!tA.isAlive && !tB.isAlive, "deadlock: a memo thread is still alive after 60 s")
    assert(err == null, s"memo build failed: $err")
    assert(nA.get == 1, s"stage A computed ${nA.get} times (double-compute)")
    assert(nB.get == 1, s"stage B computed ${nB.get} times (double-compute)")
    // Later consumers are cache hits: same DataFrame instance, no recompute.
    assert(stageA() eq stageA())
    assert(nA.get == 1 && nB.get == 1)
  }

  test("failed compute is not cached: the next caller retries") {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val n = new AtomicInteger(0)
    def build(fail: Boolean) = Memo.stage(spark, sf, s"memospec_fail_$id") {
      n.incrementAndGet()
      if (fail) sys.error("injected build failure")
      spark.range(3).toDF("id").localCheckpoint(true)
    }
    val e = intercept[RuntimeException] { build(fail = true) }
    assert(e.getMessage == "injected build failure") // unwrapped, not ExecutionException
    assert(build(fail = false).count() == 3)
    assert(n.get == 2)
  }

  test("real stages: shingles3 and near_pairs race from two threads without deadlock") {
    // near_pairs' compute re-enters the memo for shingles3 — the exact
    // production nesting — while a second thread builds shingles3
    // directly. The loser of the shingles3 race must block only on that
    // key's latch, and both must finish.
    @volatile var err: Throwable = null
    val t1 = new Thread(() => try Dedup.shingled(spark, sf)
                             catch { case e: Throwable => err = e })
    val t2 = new Thread(() => try Dedup.nearPairs(spark, sf)
                             catch { case e: Throwable => err = e })
    t1.start(); t2.start()
    t1.join(120000); t2.join(120000)
    assert(!t1.isAlive && !t2.isAlive, "deadlock: a stage thread is still alive after 120 s")
    assert(err == null, s"stage build failed: $err")
    // Both stages are now pinned: re-entry is the same instance.
    assert(Dedup.shingled(spark, sf) eq Dedup.shingled(spark, sf))
    assert(Dedup.nearPairs(spark, sf) eq Dedup.nearPairs(spark, sf))
  }
}
