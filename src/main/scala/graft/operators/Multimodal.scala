package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2C): image/audio/video
  * payloads ride as opaque `BinaryType` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as
  * compiled batch functions over the bytes.
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * `decodeImage` is a clearly-marked DETERMINISTIC FAKE — it derives
  * plausible (width, height, channels) from the payload bytes. The
  * Spark-side plumbing (binary schema, metadata struct, UDF signatures,
  * partition-batch path) is real and is what a codec drop-in would reuse
  * unchanged: replace the body of [[decodeImage]]/[[decodeBatch]] with a
  * real decoder and every query keeps working.
  *
  * Scale posture: payloads never leave executors (no driver collect),
  * all transforms are row-local (embarrassingly parallel), and binary
  * stays columnar in parquet, so a 100 TB media table partitions like
  * any other.
  */
object Multimodal {

  /** Fake decoded-image header, stable per payload. */
  final case class ImageHeader(width: Int, height: Int, channels: Int)

  /** Attach a binary payload + typed metadata struct to a text corpus —
    * the canonical shape of a multimodal table: (id, payload binary,
    * meta struct&lt;mime, n_bytes, checksum&gt;). */
  def attach(df: DataFrame, idCol: String, textCol: String,
      mime: String = "application/octet-stream"): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    df.withColumn("payload", payload)
      .withColumn("meta", struct(
        lit(mime).as("mime"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("checksum")))
  }

  /** DETERMINISTIC STUB of an image decode: header fields are a fixed
    * arithmetic function of the first bytes and the length, so results
    * are reproducible across engines. Swap the body for a real codec
    * (e.g. javax.imageio) to productionize; the signature
    * (bytes → header struct) is the real contract. */
  val decodeImage = udf { bytes: Array[Byte] =>
    if (bytes == null || bytes.length < 2) null
    else {
      val n = bytes.length
      val b0 = bytes(0) & 0xff
      val b1 = bytes(1) & 0xff
      ImageHeader(
        width = 16 + (b0 * 31 + n) % 497,
        height = 16 + (b1 * 17 + n * 7) % 311,
        channels = 1 + (b0 + n) % 4)
    }
  }

  /** "Resize" stub: deterministic byte decimation (every k-th byte) —
    * the real-codec version would decode, scale, re-encode; the plumbing
    * (binary → binary, row-local) is identical. */
  val downsample = udf { (bytes: Array[Byte], k: Int) =>
    if (bytes == null || k <= 0) null
    else {
      val out = new Array[Byte]((bytes.length + k - 1) / k)
      var i = 0
      while (i < out.length) { out(i) = bytes(i * k); i += 1 }
      out
    }
  }

  /** Split a payload into fixed-size frames (last frame may be short) —
    * the video/audio frame-extraction shape: binary → array&lt;binary&gt;,
    * typically followed by `posexplode` and per-frame processing. */
  val frames = udf { (bytes: Array[Byte], frameSize: Int) =>
    if (bytes == null || frameSize <= 0) null
    else bytes.grouped(frameSize).toArray
  }

  /** 16-bucket byte histogram (bucket = byte >>> 4) — a stand-in for any
    * per-payload feature extraction; compiled single pass. */
  val byteHistogram = udf { bytes: Array[Byte] =>
    val h = new Array[Int](16)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { h((bytes(i) & 0xff) >>> 4) += 1; i += 1 }
    }
    h
  }

  /** Partition-batch decode path: processes payloads a partition at a
    * time (the Scala analogue of a batched pandas UDF — same batch
    * shape, same executor locality). A real decoder would amortize codec
    * init across the partition here. */
  def decodeBatch(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would go here (codec context, buffers)
        it.map { case (id, bytes) =>
          if (bytes == null || bytes.length < 2) (id, 0, 0, 0)
          else {
            val n = bytes.length
            val b0 = bytes(0) & 0xff
            val b1 = bytes(1) & 0xff
            (id, 16 + (b0 * 31 + n) % 497, 16 + (b1 * 17 + n * 7) % 311,
              1 + (b0 + n) % 4)
          }
        }
      }
    out.toDF(idCol, "width", "height", "channels")
  }

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
