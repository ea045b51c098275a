package graft.llmops

import org.apache.spark.sql.functions._
import graft.QuerySpec

/** Multimodal-column plumbing — images/audio/video as opaque `binary`
  * columns with typed metadata (llmops extension). The decode itself is a
  * clearly-marked deterministic STUB (no codec libraries in this
  * environment); everything around it — the binary column, the typed
  * Dataset schema, the partition-wise batch processing via mapPartitions
  * (the JVM analogue of arrow-batched UDFs), the frame-sampling fan-out —
  * is real and oracle-checked.
  *
  * Scale shape: decode is per-row/per-partition (no shuffle); frame
  * sampling fans out rows with a generator (Catalyst Generate), keeping
  * memory bounded per batch regardless of corpus size.
  */
object Multimodal {

  /** Raw media row: id + opaque payload bytes. */
  final case class RawMedia(doc_id: Long, media: Array[Byte])

  /** Decoded metadata produced by the (stub) decoder, including the
    * "resized" fixed-size feature vector. */
  final case class DecodedMedia(
      doc_id: Long, byte_len: Int, width: Int, height: Int,
      channel_mean: Double, thumb: Array[Double])

  /** STUB DECODER + RESIZE — deterministic fake standing in for a real
    * image decode + downscale (e.g. JPEG dims, mean pixel, 8-bucket
    * thumbnail). Derives "dimensions" from the payload length, the
    * "channel mean" from raw byte values, and the "resized" feature
    * vector as 8 chunk means over the payload — so the full
    * decode→feature-extract→resize plumbing is end-to-end testable; swap
    * this single function for a real codec on a cluster with native libs. */
  private def decodeStub(rows: Iterator[RawMedia]): Iterator[DecodedMedia] =
    rows.map { r =>
      val n = r.media.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += r.media(i) & 0xff; i += 1 }
      val thumb = new Array[Double](8)
      if (n > 0) {
        val chunk = math.max(1, n / 8)
        var c = 0
        while (c < 8) {
          val from = math.min(c * chunk, n)
          val until = if (c == 7) n else math.min((c + 1) * chunk, n)
          var s = 0L
          var j = from
          while (j < until) { s += r.media(j) & 0xff; j += 1 }
          thumb(c) = if (until > from) s.toDouble / (until - from) else 0.0
          c += 1
        }
      }
      DecodedMedia(
        doc_id = r.doc_id,
        byte_len = n,
        width = 64 * (1 + n % 16),
        height = 64 * (1 + n % 9),
        // Empty payload → 0.0 (not NaN); mirrored by the q92 oracle's CASE.
        channel_mean = if (n == 0) 0.0 else sum.toDouble / n,
        thumb = thumb)
    }

  /** The typed decode pipeline, reusable by queries and specs. */
  def decoded(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.Dataset[DecodedMedia] = {
    val sp = QuerySpec.prepared(s, dir)
    import sp.implicits._
    sp.table("documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[RawMedia]
      .mapPartitions(decodeStub)
  }

  /** Binary decode pipeline: text → bytes (the opaque media payload) →
    * typed Dataset → partition-wise stub decode → metadata table.
    * Oracle note: the DuckDB side counts characters/code points, the stub
    * counts UTF-8 bytes — equivalent because the documents fixture is
    * pure ASCII (asserted in LlmOpsSpec); a multi-byte corpus would need
    * a byte-based oracle. */
  val q92DecodePipeline: QuerySpec = QuerySpec(
    "q92_mm_decode_pipeline",
    """SELECT doc_id,
      |  LENGTH(text) AS byte_len,
      |  64 * (1 + LENGTH(text) % 16) AS width,
      |  64 * (1 + LENGTH(text) % 9) AS height,
      |  CASE WHEN LENGTH(text) = 0 THEN 0.0
      |       ELSE ROUND(CAST(list_aggregate(list_transform(range(LENGTH(text)),
      |              i -> ascii(substr(text, i + 1, 1))), 'sum') AS DOUBLE)
      |            / LENGTH(text), 6) END AS channel_mean
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    decoded(s, dir)
      .toDF()
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        round(col("channel_mean"), 6).as("channel_mean"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: split the payload into fixed-size "frames" and emit
    * one fingerprint row per frame (video → frame batch shape). */
  val q93FrameSample: QuerySpec = QuerySpec.sql2(
    "q93_mm_frame_sample",
    // greatest(…, 1): an empty payload still yields one (empty) frame on
    // both engines — Spark's sequence(0, -1) would otherwise produce the
    // descending array [0, -1].
    """SELECT doc_id, frame_no,
      |  md5(substr(text, frame_no * 100 + 1, 100)) AS frame_md5
      |FROM documents
      |LATERAL VIEW explode(sequence(0, GREATEST(CAST(CEIL(LENGTH(text) / 100.0) AS INT), 1) - 1)) t AS frame_no
      |ORDER BY doc_id, frame_no""".stripMargin,
    """SELECT doc_id,
      |  unnest(range(GREATEST(CAST(CEIL(LENGTH(text) / 100.0) AS INT), 1))) AS frame_no,
      |  unnest(list_transform(range(GREATEST(CAST(CEIL(LENGTH(text) / 100.0) AS INT), 1)),
      |    f -> md5(substr(text, f * 100 + 1, 100)))) AS frame_md5
      |FROM documents
      |ORDER BY doc_id, frame_no""".stripMargin)

  val all: Seq[QuerySpec] = Seq(q92DecodePipeline.benched, q93FrameSample)
}
