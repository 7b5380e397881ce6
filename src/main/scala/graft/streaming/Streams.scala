package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** One event row as the typed streaming surface sees it (`ts` is µs
  * TimestampType — watermarks need an event-time column; under the pinned
  * UTC session it equals the batch TIMESTAMP_NTZ wall clock). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

/** A finalized user session emitted by the stateful sessionizer. */
case class UserSession(user_id: Long, sess_start: java.sql.Timestamp,
                       sess_end: java.sql.Timestamp, n_events: Long)

/** SURVEY §2i — Structured Streaming over the `events` shape.
  *
  * Every transformation below takes an input `DataFrame`/`Dataset` and
  * never cares whether it is streaming or batch — the same function is
  * applied to a `MemoryStream` source in the streaming tests and to the
  * batch fixture for the equivalence assertion (stream result == batch
  * result on the same rows), the standard Spark testing idiom. Verify's
  * DuckDB oracles cover the batch twins (`q_events_*` in
  * [[graft.operators.EventsBatch]]); these are the streaming halves.
  *
  * Scale notes (100 TB/day firehose):
  *  - all window aggs are keyed by (window, event_type)/(user) — state is
  *    bounded by watermark horizon × key cardinality, not stream length;
  *  - watermarks bound state eviction; without one, session/dedup state
  *    grows unboundedly — every stateful op here demands one;
  *  - `foreachBatch` gives exactly-once file sinks via the checkpoint's
  *    batchId; the REST sink reuses the same idempotent-batch pattern. */
object Streams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** st_tumbling: 1 h tumbling count/sum by event_type. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(38,4)")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"),
              col("sum_value"))

  /** st_sliding: 1 h window sliding every 15 min. */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("n"))

  /** st_session: per-user session windows with a 30 min gap. Needs a
    * watermark upstream in streaming mode (append output). */
  def sessionWindows(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
           count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess_start"), col("sess_end"), col("n_events"))

  /** st_watermark_late: tumbling agg behind a 10 min watermark — events
    * older than (max event time − 10 min) are dropped, the state-bounding
    * contract every 100 TB stream needs. */
  def tumblingWithWatermark(events: DataFrame): DataFrame =
    tumbling(events.withWatermark("ts", "10 minutes"))

  /** st_dedup: stateful exact dedup on event_id, state bounded by the
    * watermark horizon. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** st_stream_static_join: enrich the stream against a static dimension
    * (broadcast on every micro-batch — no stream-side state). */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"))

  /** st_sessionize_state: custom per-user session state machine via
    * flatMapGroupsWithState — the genuinely stateful operator. Sessions
    * close either when a gap > 30 min is observed in-order or when the
    * event-time timeout fires (watermark passed the session's horizon).
    *
    * In-state buffering is bounded: only (start, end, count) per live
    * session, never the events themselves. */
  def sessionize(events: Dataset[Ev]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    // State runs in MICROseconds — java.sql.Timestamp.getTime is only ms,
    // and the fixture timestamps carry µs that must round-trip exactly.
    val gapUs = 30L * 60 * 1000000L
    def us(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    def ts(u: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(u / 1000000L * 1000)
      t.setNanos((u % 1000000L).toInt * 1000)
      t
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[(Long, Long, Long)]) =>
          def toSession(s: (Long, Long, Long)) =
            UserSession(userId, ts(s._1), ts(s._2), s._3)

          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            // Events inside one micro-batch arrive unordered — sort here;
            // cross-batch disorder is what the timeout/watermark handles.
            val evs = it.toSeq.sortBy(e => (us(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[UserSession]
            evs.foreach { e =>
              val t = us(e.ts)
              cur match {
                case Some(s) if t - s._2 <= gapUs =>
                  cur = Some((s._1, math.max(s._2, t), s._3 + 1))
                case Some(s) =>
                  closed += toSession(s)
                  cur = Some((t, t, 1L))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Timeout must sit past the current watermark (Spark rejects
              // earlier values) — a user whose last event trails the global
              // watermark times out on the next batch instead of throwing.
              state.setTimeoutTimestamp(
                math.max(s._2 / 1000 + gapUs / 1000,
                         state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** st_transform_with_state: per-user running (count, value-total) via
    * Spark 4's transformWithState — the modern typed stateful API
    * (arbitrary per-key state cells, timers, TTL). State here is one
    * (count, sum) pair per user; each micro-batch emits the updated
    * running totals (Update mode). Requires the RocksDB state store
    * provider, which is how this state surface scales past executor
    * memory at 100 TB — state lives on local disk + changelog, not heap. */
  def runningTotals(events: Dataset[Ev]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id).transformWithState(
      new StatefulProcessor[Long, Ev, (Long, Long, Double)] {
        @transient private var st: ValueState[(Long, Double)] = _
        override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
          st = getHandle.getValueState[(Long, Double)](
            "totals", org.apache.spark.sql.Encoders.product[(Long, Double)],
            TTLConfig.NONE)
        override def handleInputRows(key: Long, rows: Iterator[Ev],
                                     timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
          var (n, v) = if (st.exists()) st.get() else (0L, 0.0)
          rows.foreach { e => n += 1; v += e.value }
          st.update((n, v))
          Iterator.single((key, n, v))
        }
      },
      TimeMode.None(), OutputMode.Update())
  }

  /** st_stream_stream_join: purchases joined to the same user's clicks in
    * the preceding hour — a genuine stream×stream inner join. BOTH sides
    * carry watermarks and the join predicate carries the event-time band;
    * together they bound each side's join state to the watermark horizon
    * (without them Spark must buffer both streams forever — the 100 TB
    * non-starter). Clicks keep a wider watermark: a click may be joined
    * by a purchase up to 1 h later, so its state must outlive the
    * purchase watermark by the band width. */
  def streamStreamJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts").as("buy_ts"))
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts").as("click_ts"))
    p.join(c, col("user_id") === col("c_user") &&
              col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
              col("click_ts") <= col("buy_ts"))
      .select(col("buy_id"), col("click_id"), col("user_id"))
  }

  /** st_stream_stream_left: LEFT OUTER stream-stream join — same interval
    * band as [[streamStreamJoin]], but purchases with no click in the
    * band must still emit (click_id NULL) once the click watermark passes
    * the band's horizon and proves no match can arrive. This is the
    * semantics batch LEFT JOIN gives for free and streaming can only
    * provide under both watermarks + a time-bound join condition: the
    * null side is emitted at state eviction, not at row arrival. */
  def streamStreamLeftJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("buy_id"), col("user_id"), col("ts").as("buy_ts"))
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
              col("ts").as("click_ts"))
    p.join(c, col("user_id") === col("c_user") &&
              col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
              col("click_ts") <= col("buy_ts"),
           "left_outer")
      .select(col("buy_id"), col("click_id"), col("user_id"))
  }

  /** src_stream_file: replay a parquet directory as a micro-batched file
    * stream (schema must be declared — streaming reads never infer). */
  def fileStream(spark: SparkSession, dir: String, schema: StructType,
                 maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** st_foreachbatch_sink: exactly-once-ish micro-batch parquet sink —
    * the checkpoint records committed batchIds, so a replayed batch
    * overwrites its own deterministic output path instead of appending
    * duplicates (idempotent writes + checkpointed offsets = effectively
    * exactly-once for a file sink). */
  def foreachBatchParquet(df: DataFrame, outDir: String,
                          checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
      .start()

  /** st_upsert_sink: streaming CDC-apply — each micro-batch reduces to
    * latest-per-user (max(struct(ts, value)): deterministic even on ts
    * ties) and MERGEs into a keyed serving table, the per-batch run of
    * q_merge_upsert's plan. State versions are write-audit-publish: a new
    * directory per batch plus a pointer file, never an in-place overwrite
    * of the directory being read (Spark reads lazily — overwriting the
    * input of the running merge would corrupt it). Replayed batches
    * rewrite their own version dir and re-point — idempotent, so
    * checkpoint + this sink is effectively exactly-once. */
  def upsertSink(df: DataFrame, stateDir: String,
                 checkpointDir: String): StreamingQuery = {
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val latest = batch
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("value"))).as("m"))
          .select(col("user_id"), col("m.ts").as("ts"), col("m.value").as("value"))
        val merged = currentState(batch.sparkSession, stateDir) match {
          case Some(cur) => cur.unionByName(latest)
            .groupBy(col("user_id"))
            .agg(max(struct(col("ts"), col("value"))).as("m"))
            .select(col("user_id"), col("m.ts").as("ts"), col("m.value").as("value"))
          case None => latest
        }
        merged.write.mode("overwrite").parquet(s"$stateDir/v_$batchId")
        val ptr = java.nio.file.Paths.get(stateDir, "_LATEST")
        java.nio.file.Files.writeString(ptr, batchId.toString)
        ()
      }
      .start()
  }

  /** The serving table [[upsertSink]] maintains: the version the pointer
    * names, or None before the first publish. */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val ptr = java.nio.file.Paths.get(stateDir, "_LATEST")
    if (java.nio.file.Files.exists(ptr))
      Some(spark.read.parquet(s"$stateDir/v_${java.nio.file.Files.readString(ptr).trim}"))
    else None
  }

  /** st_ewma_state: the streaming form of q_ewma's sequential per-key
    * recurrence — constant O(1) state per user (running count + current
    * ewma), never the event history, which is what replaces the batch
    * operator's collected array when the key stream is unbounded. Each
    * update emits the user's current (n, ewma); with in-order feed the
    * final update per user equals the batch fold bit-for-bit (same
    * s*0.5 + v*0.5 op order). In-batch arrival is sorted here;
    * cross-batch order is the replayer's contract (event-time-ordered
    * chunks), matching the batch twin's (ts, event_id) order. */
  def ewmaState(events: Dataset[Ev]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    def us(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[(Long, Double)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          it.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
            s = if (n == 0) e.value else s * 0.5 + e.value * 0.5
            n += 1
          }
          state.update((n, s))
          (userId, n, s)
      }
  }
}
