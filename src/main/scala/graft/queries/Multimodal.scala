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
    })

  def queries: Seq[Q] = ql
}
