package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Streaming-DataFrame constructor bridge for graft's table source
  * ([[graft.streaming.GraftTableSource]]). A V1 streaming `Source`'s
  * `getBatch` must hand back a DataFrame whose plan is FLAGGED
  * streaming (`isStreaming = true`) — Spark's own FileStreamSource
  * does this via `SparkSession.internalCreateDataFrame`, which is
  * `private[sql]`; same one-object shim pattern as
  * [[GraftColumnBridge]], the only non-`graft` package in this repo. */
object GraftStreamBridge {
  def streamingDf(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = true)

  /** The inverse direction, for graft's table SINK
    * ([[graft.streaming.GraftTableSink]]): a V1 `Sink.addBatch` gets a
    * streaming-flagged DataFrame it must NOT re-plan through the
    * streaming path to write it — Spark's own sinks rewrap the
    * executed rows as a BATCH DataFrame the same way. */
  def batchDf(spark: SparkSession, rows: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming = false)
}
