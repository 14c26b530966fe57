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
}
