package graft.queries

import graft.{Q, T}
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal => MM}

/** Multimodal-column surface (SURVEY.md §2C): binary payloads + typed
  * metadata, decode/resize/frame-sample/feature-extract over them.
  *
  * The payload is `encode(text, 'UTF-8')` — the corpus is pure ASCII
  * (verified), so the DuckDB oracle can compute the same bytes on the
  * VARCHAR side (byte offset ≡ char offset, `md5(varchar)` hashes the
  * same UTF-8 bytes Spark's `md5(binary)` sees) while Spark operates on
  * a genuine BinaryType column end-to-end.
  */
object Multimodal {

  private def ql: Seq[Q] = Seq(

    // ---- payload + typed metadata struct ----
    Q("q35_mm_meta",
      """SELECT doc_id, 'application/octet-stream' AS mime,
        |  length(text) AS n_bytes, md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      MM.attach(T.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("meta.mime").as("mime"),
          col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
        .orderBy("doc_id")
    },

    // ---- stubbed image decode (deterministic fake header) ----
    Q("q36_mm_decode",
      """SELECT doc_id,
        |  16 + (ascii(substr(text, 1, 1)) * 31 + length(text)) % 497 AS width,
        |  16 + (ascii(substr(text, 2, 1)) * 17 + length(text) * 7) % 311 AS height,
        |  1 + (ascii(substr(text, 1, 1)) + length(text)) % 4 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      MM.attach(T.documents(s, d), "doc_id", "text")
        .withColumn("hdr", MM.decodeImage(col("payload")))
        .select(col("doc_id"), col("hdr.width").as("width"),
          col("hdr.height").as("height"), col("hdr.channels").as("channels"))
        .orderBy("doc_id")
    },

    // ---- frame sampling: 64-byte frames, every 3rd kept ----
    Q("q37_mm_frames",
      """WITH f AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS frame_idx
        |  FROM documents)
        |SELECT doc_id, frame_idx,
        |  length(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS frame_bytes,
        |  md5(substr(text, CAST(frame_idx * 64 + 1 AS BIGINT), 64)) AS frame_md5
        |FROM f WHERE frame_idx % 3 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
      MM.attach(T.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), posexplode(MM.frames(col("payload"), lit(64))))
        .filter(col("pos") % 3 === 0)
        .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
          length(col("col")).as("frame_bytes"), md5(col("col")).as("frame_md5"))
        .orderBy("doc_id", "frame_idx")
    },

    // ---- resize stub: byte decimation (every 4th byte) ----
    Q("q38_mm_resize",
      """WITH r AS (
        |  SELECT doc_id, length(text) AS orig_bytes,
        |    array_to_string(list_transform(range(0, length(text), 4),
        |      i -> substr(text, CAST(i + 1 AS BIGINT), 1)), '') AS resized
        |  FROM documents)
        |SELECT doc_id, orig_bytes, length(resized) AS resized_bytes,
        |  md5(resized) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      MM.attach(T.documents(s, d), "doc_id", "text")
        .withColumn("resized", MM.downsample(col("payload"), lit(4)))
        .select(col("doc_id"), col("meta.n_bytes").as("orig_bytes"),
          length(col("resized")).as("resized_bytes"),
          md5(col("resized")).as("resized_md5"))
        .orderBy("doc_id")
    },

    // ---- feature extraction: 16-bucket byte histogram ----
    Q("q39_mm_histogram",
      """WITH codes AS (
        |  SELECT doc_id,
        |    list_transform(range(0, length(text)),
        |      i -> ascii(substr(text, CAST(i + 1 AS BIGINT), 1)) // 16) AS cs
        |  FROM documents),
        |b AS (SELECT unnest(range(0, 16)) AS bucket)
        |SELECT doc_id, bucket,
        |  len(list_filter(cs, x -> x = bucket)) AS cnt
        |FROM codes CROSS JOIN b
        |ORDER BY doc_id, bucket""".stripMargin) { (s, d) =>
      MM.attach(T.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), posexplode(MM.byteHistogram(col("payload"))))
        .select(col("doc_id"), col("pos").cast("long").as("bucket"),
          col("col").cast("long").as("cnt"))
        .orderBy("doc_id", "bucket")
    },

    // ---- REAL codec roundtrip: PNG encode → ImageIO decode ----------
    // Each doc renders a solid-gray PNG whose dimensions and gray level
    // are pure functions of (n_chars, doc_id); the REAL decoder must
    // hand back exactly those dimensions and (gray is a luma fixpoint
    // under Rec.601) exactly that luma. The oracle computes the
    // expected values symbolically — the hash-match certifies the
    // actual JDK encode/decode roundtrip, not a stub.
    Q("q84_mm_codec_roundtrip",
      """SELECT doc_id,
        |  CAST(16 + n_chars % 32 AS INT) AS width,
        |  CAST(8 + n_chars % 16 AS INT) AS height,
        |  TRUE AS decoded,
        |  CAST(doc_id % 256 AS DOUBLE) AS luma
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .withColumn("png", MM.solidPng(
          pmod(col("doc_id"), lit(256)).cast("int"),
          (lit(16) + pmod(col("n_chars"), lit(32))).cast("int"),
          (lit(8) + pmod(col("n_chars"), lit(16))).cast("int")))
        .withColumn("hdr", MM.decodeImage(col("png")))
        .select(col("doc_id"), col("hdr.width").as("width"),
          col("hdr.height").as("height"), col("hdr.decoded").as("decoded"),
          MM.meanLuma(col("png")).as("luma"))
        .orderBy("doc_id")
    },

    // ---- REAL audio metadata: PCM WAV encode → RIFF chunk-walk parse --
    Q("q85_wav_meta",
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits,
        |  CAST(n_chars % 4096 AS BIGINT) AS n_samples,
        |  round((n_chars % 4096) / CAST(8000 + (doc_id % 8) * 1000 AS DOUBLE)
        |        * 100000) / 100 AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      T.documents(s, d)
        .withColumn("wav", MM.pcmWav(
          (lit(8000) + pmod(col("doc_id"), lit(8)) * 1000).cast("int"),
          (lit(1) + pmod(col("doc_id"), lit(2))).cast("int"),
          pmod(col("n_chars"), lit(4096)).cast("int")))
        .withColumn("w", MM.decodeWav(col("wav")))
        .select(col("doc_id"),
          col("w.sampleRate").as("sample_rate"),
          col("w.channels").as("channels"),
          col("w.bitsPerSample").as("bits"),
          col("w.nSamples").as("n_samples"),
          col("w.durationMs").as("duration_ms"))
        .orderBy("doc_id")
    })

  def queries: Seq[Q] = ql
}
