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

  /** POST every row of `df` as a JSON document in batches of `batchSize`.
    * `mkTransport(partitionId, taskAttemptId)` runs on the executor. */
  def post(df: DataFrame, batchSize: Int = 100)
          (mkTransport: (Int, Long) => Transport): Unit = {
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val transport = mkTransport(tc.partitionId(), tc.taskAttemptId())
        try it.grouped(batchSize).foreach(b => transport.post(b.toSeq))
        finally transport.close()
      }
    }
  }

  /** Convenience: POST to a local JSON-lines directory (the test shape). */
  def postToDir(df: DataFrame, dir: String, batchSize: Int = 100): Unit =
    post(df, batchSize)((pid, attempt) => new FileTransport(dir, pid, attempt))
}
