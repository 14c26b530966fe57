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
  * token sum of all earlier documents in its shard (window order).
  * `orderCol` must be UNIQUE within a shard — ties make the running sum
  * (and the two-phase `max_by` last-row shortcut) order-dependent. A
  * document straddling a boundary counts toward the bin it starts in —
  * the standard greedy contiguous approximation (exact bin-capping is
  * inherently sequential; this keeps the same average fill with one
  * window pass).
  *
  * Two entry points with different scale shapes:
  *
  *  - [[packBins]] — one partitioned window per shard. Per-task state is
  *    one shard's running sum, so it scales with SHARD CARDINALITY: fine
  *    when the shard key is fine-grained, an anti-scale shape when it is
  *    near-constant (a `lang` key serializes the `en` majority of a
  *    100 TB corpus through one task).
  *  - [[packBinsScaled]] — two-phase hierarchical packing for coarse
  *    shard keys. Each shard hash-splits into `subShards` deterministic
  *    sub-shards (portable key hash, so the layout is reproducible
  *    across engines); phase 1 packs each sub-shard independently
  *    (parallelism = shards × subShards, per-task state one SUB-shard);
  *    phase 2 composes global bin ids by offsetting each sub-shard's
  *    local bins by the bins used by lower-numbered sub-shards — a tiny
  *    aggregate (shards × subShards rows) broadcast back. Bins stay
  *    dense per shard; each sub-shard owns a contiguous bin range.
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

  /** Two-phase packing: per-task state bounded by one (shard, sub-shard)
    * slice instead of a whole shard. The sub-shard assignment is the
    * portable polynomial hash of the order key ([[Sampling.hashBucket]]),
    * so a SQL oracle can rebuild the identical layout. The phase-2
    * offset table has `|shards| × subShards` rows — broadcast-joined, so
    * the extra stage is narrow. */
  def packBinsScaled(df: DataFrame, tokenCol: String, orderCol: String,
      capacity: Long, shardCols: Seq[String], subShards: Int,
      binCol: String = "bin"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(subShards > 0, "subShards must be positive")
    val keys = shardCols :+ "__sub"
    val sub = df.withColumn("__sub",
      Sampling.hashBucket(col(orderCol), subShards))
    // phase 1: independent greedy offset packing per (shard, sub-shard)
    val localW = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val local = sub
      .withColumn("__cum", sum(col(tokenCol)).over(localW))
      .withColumn("__lbin",
        floor((col("__cum") - col(tokenCol)) / lit(capacity.toDouble))
          .cast("long"))
    // phase 2: bins used per sub-shard -> global offset = bins used by
    // lower-numbered sub-shards of the same shard (tiny running sum over
    // subShards rows per shard). Bins-used is computed from a PLAIN
    // aggregate, not from the phase-1 window: start offsets are monotone
    // in window order, so max(local_bin) sits at the last row —
    // floor((Σtokens − last_token)/capacity) — and the expensive
    // sub-shard sort runs exactly once (for the rows themselves), not
    // twice (measured 2× wall-clock on a 16M-row single-shard corpus
    // when the offsets re-evaluated the window).
    val offW = Window.partitionBy(shardCols.map(col): _*).orderBy(col("__sub"))
    val offsets = sub.groupBy(keys.map(col): _*)
      .agg(sum(col(tokenCol)).as("__tot"),
        max_by(col(tokenCol), col(orderCol)).as("__last"))
      .withColumn("__nb",
        floor((col("__tot") - col("__last")) / lit(capacity.toDouble))
          .cast("long") + lit(1L))
      .withColumn("__off", sum(col("__nb")).over(offW) - col("__nb"))
      .select(keys.map(k => col(k).as(s"__o_$k")) :+ col("__off"): _*)
    // null-safe key equality: a NULL shard value is a legal group (the
    // single-phase window keeps it; a plain equi-join would drop it)
    val cond = keys.map(k => col(k) <=> col(s"__o_$k")).reduce(_ && _)
    local.join(broadcast(offsets), cond)
      .withColumn(binCol, (col("__off") + col("__lbin")).cast("long"))
      // drop the internals; restore the caller's column order (same
      // contract as packBins)
      .select(df.columns.map(col) :+ col(binCol): _*)
  }
}
