package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def attached =
    Multimodal.attach(T.documents(spark, sf), "doc_id", "text")

  test("payload bytes equal utf-8 of text; meta is consistent") {
    val row = attached
      .select(col("text"), col("payload"), col("meta.n_bytes"), col("meta.checksum"))
      .head()
    val text = row.getString(0)
    val payload = row.getAs[Array[Byte]](1)
    assert(payload.sameElements(text.getBytes("UTF-8")))
    assert(row.getInt(2) === payload.length)
    assert(row.getString(3).length === 32)
  }

  test("decodeBatch (partition-batch path) matches decodeImage (udf path)") {
    val viaUdf = attached
      .select(col("doc_id"), Multimodal.decodeImage(col("payload")).as("h"))
      .select(col("doc_id"), col("h.width"), col("h.height"), col("h.channels"))
    val viaBatch = Multimodal.decodeBatch(attached, "doc_id", "payload")
    assert(viaUdf.exceptAll(viaBatch).isEmpty && viaBatch.exceptAll(viaUdf).isEmpty)
  }

  test("frames reassemble to the original payload; downsample picks every k-th byte") {
    val row = attached
      .select(col("payload"),
        Multimodal.frames(col("payload"), lit(64)).as("fs"),
        Multimodal.downsample(col("payload"), lit(4)).as("ds"))
      .head()
    val payload = row.getAs[Array[Byte]](0)
    val fs = row.getSeq[Array[Byte]](1)
    assert(fs.flatten.sameElements(payload))
    assert(fs.init.forall(_.length == 64))
    val ds = row.getAs[Array[Byte]](2)
    assert(ds.sameElements(payload.indices.collect {
      case i if i % 4 == 0 => payload(i)
    }))
  }

  test("byteHistogram counts every byte exactly once") {
    val bad = attached
      .select(col("meta.n_bytes").as("n"),
        aggregate(Multimodal.byteHistogram(col("payload")), lit(0),
          (a, b) => a + b).as("hsum"))
      .filter(col("n") =!= col("hsum"))
    assert(bad.isEmpty)
  }

  /** Encode a w×h image to real `fmt` bytes with the JDK writer; pixel
    * (x,y) = solid `rgb`. */
  private def imageBytes(w: Int, h: Int, rgb: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, buf), s"no $fmt writer")
    buf.toByteArray
  }

  test("decodeImage REALLY decodes PNG and BMP; garbage takes the labeled fallback") {
    import spark.implicits._
    val png = imageBytes(20, 10, 0x336699, "png")
    val bmp = imageBytes(7, 5, 0xff0000, "bmp")
    val junk = "BMnot really a bitmap, just text".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, bmp), (3L, junk)).toDF("id", "payload")
      .withColumn("hdr", Multimodal.decodeImage(col("payload")))
      .select(col("id"), col("hdr.width"), col("hdr.height"),
        col("hdr.channels"), col("hdr.decoded"))
    val got = df.collect().map(r => r.getLong(0) ->
      ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((20, 10, 3, true)))
    assert(got(2L) === ((7, 5, 3, true)))
    assert(!got(3L)._4, "garbage must take the pseudo fallback")
    // the batch path agrees on the real decodes
    val batch = Multimodal.decodeBatch(
        Seq((1L, png), (2L, bmp)).toDF("id", "payload"), "id", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(batch(1L) === ((20, 10)) && batch(2L) === ((7, 5)))
  }

  test("decodeWav walks RIFF chunks (LIST between fmt and data) and rejects junk") {
    import spark.implicits._
    // standard wav from the generator
    val std = Seq((1L, 8000, 2, 100)).toDF("id", "r", "c", "n")
      .select(Multimodal.pcmWav(col("r"), col("c"), col("n")).as("wav"))
      .collect().head.getAs[Array[Byte]](0)
    // splice a LIST chunk between fmt and data — a layout a fixed
    // 44-byte-offset parser would misread
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = std.slice(0, 36) ++ listChunk ++ std.drop(36)
    val riffFix = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riffFix.putInt(4, spliced.length - 8) // RIFF length covers the splice
    val rows = Seq((1L, std), (2L, spliced),
        (3L, "RIFFjunk not a wave file at all padding".getBytes("UTF-8")))
      .toDF("id", "wav")
      .select(col("id"), Multimodal.decodeWav(col("wav")).as("w"))
      .select(col("id"), col("w.sampleRate"), col("w.channels"),
        col("w.nSamples"), col("w.durationMs"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      val r = rows(id)
      assert(r.getInt(1) === 8000 && r.getInt(2) === 2 && r.getLong(3) === 100L,
        s"row $id parsed wrong: $r")
      assert(r.getDouble(4) === 12.5) // 100 / 8000 s
    }
    assert(rows(3L).isNullAt(1), "junk must parse to null, not throw")
    // non-PCM and sub-byte sample widths must reject (null, no crash):
    // patch the fmt tag to IEEE-float (3) and the bit width to 4
    def patched(patch: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val c = std.clone()
      patch(java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN))
      c
    }
    val floatWav = patched(_.putShort(20, 3.toShort)) // fmt audioFormat
    val adpcmish = patched(_.putShort(34, 4.toShort)) // bitsPerSample
    val rej = Seq((1L, floatWav), (2L, adpcmish)).toDF("id", "wav")
      .select(col("id"), Multimodal.decodeWav(col("wav")).as("w"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rej(1L), "IEEE-float WAV must parse to null (PCM-only contract)")
    assert(rej(2L), "4-bit frames must parse to null, not divide by zero")
  }

  test("resizeImage scales real images to maxDim and re-encodes decodably") {
    import spark.implicits._
    val png = imageBytes(64, 32, 0x00ff00, "png")
    val out = Seq((1L, png)).toDF("id", "payload")
      .select(Multimodal.resizeImage(col("payload"), lit(16)).as("r"))
      .collect().head.getAs[Array[Byte]](0)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back != null, "resized payload must itself decode")
    assert(back.getWidth === 16 && back.getHeight === 8)
    // luma survives a solid-color resize (green ≈ 0.587*255)
    val luma = Seq((1L, out)).toDF("id", "payload")
      .select(Multimodal.meanLuma(col("payload")).as("l"))
      .collect().head.getDouble(0)
    assert(math.abs(luma - 0.587 * 255) < 2.0, s"luma $luma")
    // an upscale request leaves dimensions alone (scale capped at 1)
    val same = Seq((1L, png)).toDF("id", "payload")
      .select(Multimodal.resizeImage(col("payload"), lit(512)).as("r"))
      .collect().head.getAs[Array[Byte]](0)
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(same)).getWidth === 64)
  }
}
