package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to contiguous fixed-token-budget
  * bins — the shard/batch layout step of an LLM training-data loader
  * (each bin is one ~capacity-token pack of documents in a stable
  * order).
  *
  * Deterministic offset packing: a document's bin is
  * `floor(start_offset / capacity)` where `start_offset` is the running
  * token sum of all earlier documents in its shard (window order). A
  * document straddling a boundary counts toward the bin it starts in —
  * the standard greedy contiguous approximation (exact bin-capping is
  * inherently sequential; this keeps the same average fill with one
  * window pass).
  *
  * Scale: the window is PARTITIONED BY the shard columns — per-task
  * state is one shard's running sum, so the operator scales with shard
  * count. An unpartitioned global cumulative sum would serialize the
  * corpus through one task; callers must supply shard columns at scale
  * (empty `shardCols` is accepted for small corpora and tests).
  */
object Packing {

  def packBins(df: DataFrame, tokenCol: String, orderCol: String,
      capacity: Long, shardCols: Seq[String],
      binCol: String = "bin"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(col(orderCol))
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn(binCol,
        floor((col("__cum") - col(tokenCol)) / lit(capacity.toDouble))
          .cast("long"))
      .drop("__cum")
  }
}
