package graft.llmops

import graft.llmops.Checkpoints.Stageable
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

  /** pHash-style 64-bit perceptual signature over the opaque payload,
    * emitted as four 16-bit bands: bit c is set when the mean sample of
    * the c-th 1/64 slice exceeds the whole payload's mean — the same
    * shape as a real DCT pHash (per-region energy vs global energy)
    * with the stub decoder standing in for the codec. Banded so the
    * dedup join needs no 64-bit packing and the hamming distance is a
    * per-band XOR popcount.
    *
    * The stub "decode" step turns the UTF-8 payload back into Unicode
    * code points and treats those as the samples. That is deliberate:
    * DuckDB's `ascii(substr(text, i, 1))` yields the i-th CODE POINT,
    * so a byte-level stub would diverge from the oracle on any
    * multi-byte text (different sample values AND a different sample
    * count). Over code points the two sides agree exactly for all
    * text — no ASCII-only assumption. */
  private def phashStub(rows: Iterator[RawMedia]): Iterator[(Long, Int, Int, Int, Int)] =
    rows.map { r =>
      val cps = new String(r.media, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
      val n = cps.length
      var total = 0L
      var i = 0
      while (i < n) { total += cps(i); i += 1 }
      val mean = if (n == 0) 0.0 else total.toDouble / n
      val chunk = math.max(1, n / 64)
      val bands = new Array[Int](4)
      var c = 0
      while (c < 64) {
        val from = math.min(c * chunk, n)
        val until = if (c == 63) n else math.min((c + 1) * chunk, n)
        if (until > from) {
          var s = 0L
          var j = from
          while (j < until) { s += cps(j); j += 1 }
          if (s.toDouble / (until - from) > mean) bands(c / 16) |= 1 << (c % 16)
        }
        c += 1
      }
      (r.doc_id, bands(0), bands(1), bands(2), bands(3))
    }

  /** Perceptual-hash media dedup — near-identical payloads found by
    * banded signature collision, the image-dedup stage of a multimodal
    * curation pipeline (pHash → band buckets → verify), with the codec
    * stubbed per this module's contract and every stage around it real.
    *
    * Pigeonhole completeness: hamming ≤ 3 across 4 bands forces at
    * least one band to collide, so the banded candidate join has 100%
    * recall at the threshold and the DuckDB oracle may use plain
    * all-pairs — same result set, different plan class (the q82 SimHash
    * argument). Candidates route through [[Dedup.boundedPairs]], so a
    * degenerate band value (e.g. every blank payload hashing to 0)
    * cannot form an unbounded single-task block at scale; exact hamming
    * verification runs only on candidates. */
  val q187PhashDedup: QuerySpec = QuerySpec(
    "q187_mm_phash_dedup",
    """WITH t AS (
      |  SELECT doc_id, text, LENGTH(text) AS n,
      |    CASE WHEN LENGTH(text) = 0 THEN 0.0
      |         ELSE CAST(list_aggregate(list_transform(range(LENGTH(text)),
      |                i -> ascii(substr(text, i + 1, 1))), 'sum') AS DOUBLE)
      |              / LENGTH(text) END AS mean,
      |    GREATEST(LENGTH(text) // 64, 1) AS chunk
      |  FROM documents),
      |cb AS (
      |  SELECT doc_id, c, c // 16 AS band, c % 16 AS pos,
      |    least(c * chunk, n) AS f,
      |    CASE WHEN c = 63 THEN n ELSE least((c + 1) * chunk, n) END AS u,
      |    text, mean
      |  FROM (SELECT doc_id, text, n, mean, chunk, unnest(range(64)) AS c FROM t) x),
      |bits AS (
      |  SELECT doc_id, band, pos,
      |    CASE WHEN u > f AND
      |      CAST(list_aggregate(list_transform(range(u - f),
      |             i -> ascii(substr(text, f + i + 1, 1))), 'sum') AS DOUBLE) / (u - f) > mean
      |      THEN 1 ELSE 0 END AS bit
      |  FROM cb),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN band = 0 THEN bit << pos ELSE 0 END) AS INT) AS b0,
      |    CAST(SUM(CASE WHEN band = 1 THEN bit << pos ELSE 0 END) AS INT) AS b1,
      |    CAST(SUM(CASE WHEN band = 2 THEN bit << pos ELSE 0 END) AS INT) AS b2,
      |    CAST(SUM(CASE WHEN band = 3 THEN bit << pos ELSE 0 END) AS INT) AS b3
      |  FROM bits GROUP BY doc_id)
      |SELECT doc_id_a, doc_id_b, hamming FROM (
      |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |       + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS INT) AS hamming
      |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id) p
      |WHERE hamming <= 3
      |ORDER BY doc_id_a, doc_id_b""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    import sp.implicits._
    val sig = sp.table("documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[RawMedia]
      .mapPartitions(phashStub)
      .toDF("doc_id", "b0", "b1", "b2", "b3")
      .staged // consumed by 4 band projections + 2 verify joins
    val keyed = (0 until 4).map { b =>
      sig.select(concat_ws(":", lit(b.toString), col(s"b$b").cast("string")).as("bkey"),
        col("doc_id").as("id"))
    }.reduce(_ unionByName _)
    val cand = Dedup.boundedPairs(keyed, 256)
      .toDF("doc_id_a", "doc_id_b").distinct()
    val a = sig.select(col("doc_id").as("doc_id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = sig.select(col("doc_id").as("doc_id_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    cand.join(a, "doc_id_a").join(b, "doc_id_b")
      .withColumn("hamming",
        expr("bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + bit_count(a2 ^ c2) + bit_count(a3 ^ c3)")
          .cast("int"))
      .filter(col("hamming") <= 3)
      .select(col("doc_id_a"), col("doc_id_b"), col("hamming"))
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  /** Audio frame-energy summary — the third modality's plumbing next to
    * image (q92/q187) and video (q93): treat the opaque payload as a
    * sample stream, frame it (100 samples/frame, the q93 window), and
    * report RMS-energy statistics per document — frames, silent frames
    * (mean-square below a fixed floor, set inside the fixture's energy
    * range so the gate actually discriminates — the VAD shape of a
    * speech pipeline), speech fraction, peak energy. The "decode" is this
    * module's documented stub (code points as samples — DuckDB's
    * ascii() replay contract, see [[phashStub]]); swap for a real PCM
    * decoder on a cluster with codec libs and nothing else changes.
    * Determinism: per-frame mean-square divides exact integer Σx² by
    * the frame length once (fixed tree); silent/peak/fraction are
    * exact algebra over those. Zero shuffle until the one doc-keyed
    * rollup. */
  private def audioStub(rows: Iterator[RawMedia]): Iterator[(Long, Long, Long, Long)] =
    rows.map { r =>
      val cps = new String(r.media, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
      val n = cps.length
      val nFrames = math.max(1, (n + 99) / 100)
      var silent = 0L
      var peakE2 = 0L
      var f = 0
      while (f < nFrames) {
        val from = f * 100
        val until = math.min(from + 100, n)
        var s2 = 0L
        var i = from
        while (i < until) { s2 += cps(i).toLong * cps(i); i += 1 }
        val ms = if (until > from) s2.toDouble / (until - from) else 0.0
        if (ms < 9600.0) silent += 1
        val e2 = math.round(ms * 100)
        if (e2 > peakE2) peakE2 = e2
        f += 1
      }
      (r.doc_id, nFrames.toLong, silent, peakE2)
    }

  val q241AudioEnergy: QuerySpec = QuerySpec(
    "q241_mm_audio_energy",
    """WITH t AS (
      |  SELECT doc_id,
      |    list_transform(range(length(text)), i -> ascii(substr(text, i + 1, 1))) AS cp,
      |    length(text) AS n
      |  FROM documents),
      |f AS (SELECT doc_id, n, cp,
      |        unnest(range(GREATEST(CAST(CEIL(n / 100.0) AS INT), 1))) AS fno
      |      FROM t),
      |e AS (SELECT doc_id, fno,
      |        CASE WHEN LEAST((fno + 1) * 100, n) > fno * 100
      |             THEN CAST(list_aggregate(list_transform(
      |                    range(LEAST((fno + 1) * 100, n) - fno * 100),
      |                    i -> CAST(cp[fno * 100 + i + 1] AS BIGINT) * cp[fno * 100 + i + 1]),
      |                  'sum') AS DOUBLE)
      |                  / (LEAST((fno + 1) * 100, n) - fno * 100)
      |             ELSE 0.0 END AS ms
      |      FROM f)
      |SELECT doc_id, COUNT(*) AS n_frames,
      |  CAST(SUM(CASE WHEN ms < 9600 THEN 1 ELSE 0 END) AS BIGINT) AS silent_frames,
      |  CAST(ROUND((COUNT(*) - SUM(CASE WHEN ms < 9600 THEN 1 ELSE 0 END)) * 1e6
      |       / COUNT(*)) AS BIGINT) AS speech_frac_e6,
      |  CAST(MAX(CAST(ROUND(ms * 100) AS BIGINT)) AS BIGINT) AS peak_ms_e2
      |FROM e GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    import sp.implicits._
    sp.table("documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[RawMedia]
      .mapPartitions(audioStub)
      .toDF("doc_id", "n_frames", "silent_frames", "peak_ms_e2")
      .select(col("doc_id"), col("n_frames"), col("silent_frames"),
        round((col("n_frames") - col("silent_frames")) * lit(1e6) / col("n_frames"))
          .cast("bigint").as("speech_frac_e6"),
        col("peak_ms_e2"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QuerySpec] = Seq(q92DecodePipeline.benched, q93FrameSample, q187PhashDedup,
    q241AudioEnergy)
}
