package graft.llm

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2h — multimodal columns. Media are opaque `binary` payloads
  * with typed metadata riding beside them in the same row (the "one wide
  * columnar table, late materialization" layout: at 100 TB the binary
  * column lives in its own parquet column chunk, so scalar-only queries
  * never read the bytes).
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * DETERMINISTIC STAND-IN (byte statistics over the payload) — but the
  * Spark-side plumbing is real and is the part that matters: binary
  * column + metadata struct in the schema, and a `mapPartitions` decode
  * pass (the Scala shape of the batched-UDF pattern: one iterator per
  * partition, codec state initialized once per partition, never per row).
  * Swap `fakeDecode` for a real codec and nothing else changes. */
object Multimodal {

  /** Per-partition "decode": byte stats standing in for pixel decode.
    * Pure function of the payload bytes → oracle-expressible. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int, Long) = {
    val nBytes = payload.length
    var nSpaces = 0
    var i = 0
    while (i < nBytes) { if (payload(i) == 0x20) nSpaces += 1; i += 1 }
    // "frame sample": every 16th byte, summed — the frame-extraction shape
    var frameSum = 0L
    var j = 0
    while (j < nBytes) { frameSum += payload(j) & 0xff; j += 16 }
    val firstByte = if (nBytes > 0) payload(0) & 0xff else -1
    (nBytes, nSpaces, firstByte, frameSum)
  }

  val qs: Seq[(String, Q)] = Seq(

    // Multimodal wide row: text features ⋈ embedding vector ⋈ scalars in
    // one struct-typed column, flattened for the cross-engine compare
    // (struct parity across engines is fragile — SURVEY §2h).
    "llm_multimodal_join" -> Q(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val e = Tables.embeddings(s, dir)
        d.join(e, col("doc_id") === col("vec_id"))
          .withColumn("mm", struct(
            col("doc_id"),
            struct(col("lang"), col("source"), col("n_chars")).as("meta"),
            size(split(col("text"), " ")).as("n_toks"),
            col("embedding"),
            col("label")))
          .select(
            col("mm.doc_id").as("doc_id"),
            col("mm.meta.lang").as("lang"),
            col("mm.meta.source").as("source"),
            col("mm.meta.n_chars").as("n_chars"),
            col("mm.n_toks").as("n_toks"),
            size(col("mm.embedding")).as("dim"),
            col("mm.label").as("label"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, source, n_chars,
                     len(string_split(text, ' ')) AS n_toks,
                     len(embedding) AS dim, label
              FROM documents JOIN embeddings ON doc_id = vec_id
              ORDER BY doc_id""")),

    // Binary payload + metadata + mapPartitions decode. The oracle
    // recomputes the byte stats from the text (payload = UTF-8 bytes of
    // ASCII text, so byte positions == char positions).
    "llm_multimodal_decode" -> Q(
      (s, dir) => {
        import s.implicits._
        val src = Tables.documents(s, dir)
          .select(col("doc_id"),
                  col("text").cast("binary").as("payload"),
                  struct(lit("text/plain").as("mime"), col("n_chars").as("declared_len"))
                    .as("meta"))
        val decoded = src.select(col("doc_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            // per-partition init would open the real codec exactly here
            it.map { case (id, payload) =>
              val (nBytes, nSpaces, firstByte, frameSum) = fakeDecode(payload)
              (id, nBytes, nSpaces, firstByte, frameSum)
            }
          }
          .toDF("doc_id", "n_bytes", "n_spaces", "first_byte", "frame_sum")
        src.select(col("doc_id"), col("meta.mime").as("mime"),
                   col("meta.declared_len").as("declared_len"))
          .join(decoded, Seq("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, 'text/plain' AS mime, n_chars AS declared_len,
                     length(text) AS n_bytes,
                     length(text) - length(replace(text, ' ', '')) AS n_spaces,
                     ascii(substr(text, 1, 1)) AS first_byte,
                     CAST(list_sum(list_transform(
                            generate_series(1, length(text), 16),
                            i -> ascii(substr(text, i, 1)))) AS BIGINT) AS frame_sum
              FROM documents
              ORDER BY doc_id""")),

    // Feature-extract + resize over the binary payload: nearest-neighbor
    // downsample to a fixed 8-cell vector (the image-resize access
    // pattern — strided reads at positions i·n/8) in the same
    // mapPartitions pass. A real pipeline swaps the byte sampler for a
    // pixel kernel; schema (fixed-length array<int> feature column),
    // batch shape, and partition-local execution are what carry to 100 TB
    // — features land beside the payload for late materialization.
    "llm_multimodal_features" -> Q(
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (id, payload) =>
              val n = payload.length
              val feat = Array.tabulate(8) { i =>
                if (n == 0) -1 else payload((i.toLong * n / 8).toInt) & 0xff
              }
              (id, feat, feat.max, feat.min)
            }
          }
          .toDF("doc_id", "feat_arr", "feat_max", "feat_min")
          // the feature vector stays array<int> in the pipeline; the
          // DECLARED column is its comma-joined string (driver's
          // comparator can't sort/hash ndarray cells)
          .select(col("doc_id"),
                  expr("concat_ws(',', transform(feat_arr, x -> CAST(x AS STRING)))")
                    .as("feat"),
                  col("feat_max"), col("feat_min"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                     array_to_string(list_transform(generate_series(0, 7),
                       i -> CAST(ascii(substr(text, CAST(i * length(text) // 8 AS INT) + 1, 1)) AS VARCHAR)), ',') AS feat,
                     list_max(list_transform(generate_series(0, 7),
                       i -> ascii(substr(text, CAST(i * length(text) // 8 AS INT) + 1, 1)))) AS feat_max,
                     list_min(list_transform(generate_series(0, 7),
                       i -> ascii(substr(text, CAST(i * length(text) // 8 AS INT) + 1, 1)))) AS feat_min
              FROM documents
              ORDER BY doc_id""")),

    // Frame-sampling fan-out — the video shape the other multimodal keys
    // don't cover: each payload is treated as fixed 256-byte frames, k=4
    // frames sample UNIFORMLY (indices floor(j·n/4), deduped when the
    // clip is short), and every sampled frame becomes its OWN OUTPUT ROW
    // — the one-frame-one-training-example layout. The fan-out is a pure
    // in-row sequence/transform explode (no mapPartitions needed), so at
    // 100 TB the frame rows materialize scan-side with no shuffle until
    // whatever consumes them; per-frame stats read only the frame's
    // slice (late materialization of the payload column). floor() is
    // spelled explicitly — Spark's CAST(double AS INT) truncates but
    // DuckDB's rounds, the one cross-engine trap in the index math.
    "llm_multimodal_frames" -> Q(
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
                expr("CAST(ceil(length(text) / 256.0) AS INT)").as("n_frames"))
        // An empty payload has n_frames=0 yet the sequence(0,3) fan-out
        // would still emit a frame_idx=0 row with frame_len=0 and
        // out-of-range substr probes — filter BEFORE the explode so
        // empty clips emit no frame rows (frame_len stays in (0, 256]).
        .filter(col("n_frames") >= 1)
        .select(col("doc_id"), col("n_frames"), col("text"),
                explode(expr(
                  """array_distinct(transform(sequence(0, 3),
                       j -> CAST(floor(j * n_frames / 4.0) AS INT)))"""))
                  .as("frame_idx"))
        .withColumn("off", col("frame_idx") * 256 + 1)
        .withColumn("frame_len",
          least(lit(256), length(col("text")) - col("frame_idx") * 256))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
                col("frame_len"),
                ascii(expr("substr(text, off, 1)")).as("first_byte"),
                ascii(expr("substr(text, off + frame_len - 1, 1)")).as("last_byte"))
        .orderBy(col("doc_id"), col("frame_idx")),
      Some("""WITH f AS (
                SELECT doc_id, text,
                       CAST(ceil(length(text) / 256.0) AS INT) AS n_frames
                FROM documents),
              x AS (
                SELECT doc_id, n_frames, text,
                       unnest(list_distinct(list_transform([0, 1, 2, 3],
                         j -> CAST(floor(j * n_frames / 4.0) AS INT))))
                         AS frame_idx
                FROM f WHERE n_frames >= 1)
              SELECT doc_id, n_frames, frame_idx,
                     least(256, length(text) - frame_idx * 256) AS frame_len,
                     ascii(substr(text, frame_idx * 256 + 1, 1)) AS first_byte,
                     ascii(substr(text, frame_idx * 256 + 1
                                  + least(256, length(text) - frame_idx * 256)
                                  - 1, 1)) AS last_byte
              FROM x ORDER BY doc_id, frame_idx"""))
  )
}
