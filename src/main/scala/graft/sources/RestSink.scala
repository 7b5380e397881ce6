package graft.sources

import org.apache.spark.sql.DataFrame
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** SURVEY §2a `snk_rest` — the reference's row-by-row REST registration
  * pattern, re-expressed distributed: rows serialize to JSON documents and
  * POST in batches from `foreachPartition`, one transport per partition
  * (connection/auth initialized once per partition, never per row — the
  * per-row HTTP call was the reference's dominant cost).
  *
  * The transport is pluggable: production would wrap an HTTP client with
  * bearer auth + retry; tests (and this offline container) use
  * [[RestSink.FileTransport]], which lands each batch as JSON-lines —
  * byte-compatible with what the wire would carry.
  *
  * Scale notes (100 TB): batching amortizes round-trips; per-partition
  * fan-out means throughput scales with executors, bounded only by the
  * endpoint; a failed batch retries idempotently (PUT-style upsert
  * endpoints) or quarantines to a dead-letter path — both are transport
  * concerns, which is exactly why the transport is the plug point. */
object RestSink {

  /** One "endpoint": receives successive JSON-document batches from one
    * partition. Implementations must be serializable (shipped to tasks)
    * and are (re)created per partition via the factory. */
  trait Transport {
    def post(batch: Seq[String]): Unit
    def close(): Unit = ()
  }

  /** Test/offline transport: each batch appends to one JSON-lines file per
    * partition attempt (unique name → no cross-task interference; a
    * retried task overwrites its own attempt file rather than duplicating). */
  class FileTransport(dir: String, partitionId: Int, attempt: Long) extends Transport {
    private val path = Paths.get(dir, f"part_$partitionId%05d_$attempt.jsonl")
    Files.createDirectories(Paths.get(dir))
    Files.deleteIfExists(path)
    override def post(batch: Seq[String]): Unit =
      Files.write(path, (batch.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Retry knobs for a flaky endpoint: up to `maxAttempts` tries per
    * batch with exponential backoff (`backoffMs`, ×`multiplier`, capped at
    * `maxBackoffMs`). Deterministic (no jitter) so tests can pin attempt
    * counts; at a real endpoint the per-partition task skew supplies the
    * de-synchronization jitter would. */
  final case class RetryPolicy(maxAttempts: Int = 3, backoffMs: Long = 50,
                               multiplier: Double = 2.0,
                               maxBackoffMs: Long = 10000) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
  }

  /** Wraps a transport with retry + optional dead-letter. A batch that
    * still fails after `policy.maxAttempts` goes to `deadLetter` when one
    * is provided (quarantine-and-continue — the pipeline keeps flowing and
    * the quarantined batches are replayable JSON); with no dead-letter the
    * failure rethrows, failing the TASK, and Spark's task retry re-runs
    * the whole partition — safe because transports are idempotent per
    * attempt (FileTransport writes an attempt-unique file; a wire
    * transport targets PUT-style upsert endpoints, see class doc). */
  class RetryingTransport(inner: Transport, policy: RetryPolicy,
                          deadLetter: Option[Seq[String] => Unit] = None)
      extends Transport {
    override def post(batch: Seq[String]): Unit = {
      var attempt = 1
      var delay = policy.backoffMs
      var done = false
      while (!done) {
        try { inner.post(batch); done = true }
        catch {
          case e: Exception if attempt < policy.maxAttempts =>
            attempt += 1
            Thread.sleep(delay)
            delay = math.min((delay * policy.multiplier).toLong,
                             policy.maxBackoffMs)
          case e: Exception =>
            deadLetter match {
              case Some(dl) => dl(batch); done = true
              case None => throw e
            }
        }
      }
    }
    override def close(): Unit = inner.close()
  }

  /** POST every row of `df` as a JSON document in batches of `batchSize`.
    * `mkTransport(partitionId, taskAttemptId)` runs on the executor.
    * `retry` + `deadLetter` wrap the transport per partition (see
    * [[RetryingTransport]]); the defaults preserve the fail-the-task
    * semantics of a bare transport. */
  def post(df: DataFrame, batchSize: Int = 100,
           retry: RetryPolicy = RetryPolicy(maxAttempts = 1),
           deadLetter: Option[(Int, Long) => Transport] = None)
          (mkTransport: (Int, Long) => Transport): Unit = {
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val attemptId = tc.taskAttemptId()
        val dlTransport = deadLetter.map(mk => mk(pid, attemptId))
        val transport = new RetryingTransport(
          mkTransport(pid, attemptId), retry,
          dlTransport.map(t => (b: Seq[String]) => t.post(b)))
        try it.grouped(batchSize).foreach(b => transport.post(b.toSeq))
        finally {
          transport.close()
          dlTransport.foreach(_.close())
        }
      }
    }
  }

  /** Convenience: POST to a local JSON-lines directory (the test shape). */
  def postToDir(df: DataFrame, dir: String, batchSize: Int = 100): Unit =
    post(df, batchSize)((pid, attempt) => new FileTransport(dir, pid, attempt))
}
