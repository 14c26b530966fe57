package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.StreamSinkProvider
import org.apache.spark.sql.streaming.OutputMode

import graft.warehouse.GraftTable

/** Structured Streaming SINK over a [[graft.warehouse.GraftTable]] —
  * the write-side twin of [[GraftTableSourceProvider]], completing the
  * first-class `readStream`/`writeStream` pair (the reference's write
  * loop instead re-opens a Flight client per tick and appends
  * at-least-once, `icerunner.py:848-906`):
  *
  * {{{
  * df.writeStream
  *   .format(classOf[graft.streaming.GraftTableSinkProvider].getName)
  *   .option("path", tableDir)           // created on first batch
  *   .option("checkpointLocation", ckpt)
  *   .start()
  * }}}
  *
  * Semantics:
  *  - EXACTLY-ONCE, not at-least-once: every commit carries the
  *    (appId, batchId) transaction marker — the Delta `txn` contract
  *    already used by [[EventStreams.ingestBatchExactlyOnce]] — where
  *    appId derives from the query's checkpoint location (the identity
  *    a restart resumes under). A crash between commit and checkpoint
  *    advance replays the batch; the marker makes the replay a no-op.
  *    Pass option `txnAppId` to override (two queries writing the same
  *    table from the same checkpoint path — never do that — would
  *    otherwise share marker streams).
  *  - `Append` mode appends one snapshot per non-empty micro-batch, so
  *    downstream `changesSince` (and the table SOURCE) consume each
  *    batch incrementally. `Complete` mode maps to [[GraftTable.replace]]
  *    — the whole-result rewrite IS Complete's contract. `Update` mode
  *    (r15) needs the keyed contract spelled out: options
  *    `mergeKeys` = "k1,k2" and `orderCol` (+ optional `tiebreak`,
  *    `deleteWhen` SQL predicate) route every micro-batch through the
  *    same guarded keyed upsert as [[EventStreams.cdcApply]] — within-
  *    batch latest per key, cross-batch reorder guard (an out-of-order
  *    redelivered older version never regresses a STORED row), a
  *    delete arm, all under the same txn markers. Update without the
  *    options refuses rather than guessing keys. Tombstones are NOT
  *    persisted (the [[GraftTable.merge]] contract, same as cdcApply):
  *    a key already DELETED has no stored version to compare, so an
  *    out-of-order redelivery arriving after its delete re-inserts it
  *    — order delete-bearing streams at batch granularity.
  *  - The table is CREATED on the first non-empty batch when absent;
  *    later batches append under the table's declared schema rules
  *    (additive evolution applies between restarts, same as any
  *    writer).
  *  - Option `branch` stages every micro-batch onto a WAP branch
  *    instead of main (Iceberg's `spark.wap.branch` workflow): main
  *    readers never observe the stream until an auditor
  *    [[graft.warehouse.GraftTable.publishBranch]]es the staged
  *    commits as ONE atomic main commit. The replay probe checks the
  *    branch log AND main (publish carries the staged markers), so a
  *    crash-replay arriving after publish+drop still no-ops. The
  *    table and branch must exist before streaming starts.
  *
  * Scale: the batch writes through the same clustered/partitioned
  * append path as every other writer (sort orders, hidden
  * partitioning, stats/blooms all apply via table configuration —
  * nothing sink-specific), and the marker probe is O(manifest). */
final class GraftTableSinkProvider extends StreamSinkProvider {
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    // DataSource lowercases option keys inconsistently across paths —
    // resolve case-insensitively
    def opt(k: String): Option[String] =
      parameters.collectFirst { case (p, v) if p.equalsIgnoreCase(k) => v }
    val path = opt("path").getOrElse(throw new IllegalArgumentException(
      "graft streaming sink needs option 'path' = table directory"))
    // refuse rather than silently ignore: layout is TABLE-level here
    // (hidden partitioning via setPartitionSpec / setSortOrder applies
    // to every writer), not a per-writer directive
    require(partitionColumns.isEmpty,
      "graft table sink ignores writeStream.partitionBy — declare the " +
        "layout on the table itself (setPartitionSpec/setSortOrder)")
    // Update mode IS supported once the caller supplies the keyed
    // contract it needs: option `mergeKeys` (comma-joined key columns)
    // + `orderCol` (the version column the reorder guard compares) —
    // each micro-batch then routes through the same guarded keyed
    // upsert as EventStreams.cdcApply, txn-marked. `tiebreak` breaks
    // orderCol ties (defaults to orderCol: equal versions re-apply,
    // idempotent); `deleteWhen` is a SQL predicate over the change row
    // whose matching latest versions DELETE instead of upsert.
    val mergeKeys = opt("mergeKeys")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val orderCol = opt("orderCol")
    if (outputMode == OutputMode.Update()) {
      require(mergeKeys.nonEmpty && orderCol.nonEmpty,
        "graft table sink in Update mode needs options 'mergeKeys' " +
          "(comma-joined key columns) and 'orderCol' (the version " +
          "column ordering redeliveries) — without a keyed contract " +
          "use Append, or EventStreams.cdcApply")
    } else require(mergeKeys.isEmpty && opt("orderCol").isEmpty &&
      opt("tiebreak").isEmpty && opt("deleteWhen").isEmpty,
      "options mergeKeys/orderCol/tiebreak/deleteWhen imply keyed " +
        "upsert application — use outputMode(Update) with them " +
        "(silently appending changelog rows as data is the bug this " +
        "refusal prevents)")
    val appId = opt("txnAppId")
      .orElse(opt("checkpointLocation").map(EventStreams.txnAppId))
      .getOrElse(throw new IllegalArgumentException(
        "graft streaming sink needs a checkpointLocation (or txnAppId) " +
          "to anchor its exactly-once transaction markers"))
    val branch = opt("branch")
    require(branch.isEmpty || outputMode != OutputMode.Complete(),
      "graft table sink: Complete mode cannot stage onto a branch " +
        "(branches stage appends; publish is the whole-view commit)")
    require(branch.isEmpty || mergeKeys.isEmpty,
      "graft table sink: Update mode cannot stage onto a branch " +
        "(branches stage appends only; upserts rewrite main)")
    new GraftTableSink(Paths.get(path), appId,
      complete = outputMode == OutputMode.Complete(), branch = branch,
      mergeKeys = mergeKeys, orderCol = orderCol.getOrElse(""),
      tiebreak = opt("tiebreak").orElse(orderCol).getOrElse(""),
      deleteWhen = opt("deleteWhen"))
  }
}

final class GraftTableSink(dir: java.nio.file.Path, appId: String,
    complete: Boolean, branch: Option[String] = None,
    mergeKeys: Seq[String] = Nil, orderCol: String = "",
    tiebreak: String = "", deleteWhen: Option[String] = None) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val tableOpt = GraftTable.load(spark, dir, dir.getFileName.toString)
    // crash-replay probe BEFORE any work: a batchId at-or-below the
    // last committed marker for this app already landed. Branch
    // staging probes the branch log AND the main log (publishBranch
    // carries staged markers into its one main commit, so a replay
    // arriving after publish+drop still no-ops).
    val committed = branch match {
      case Some(b) => tableOpt.flatMap(_.lastTxnBatchBranch(b, appId))
      case None => tableOpt.flatMap(_.lastTxnBatch(appId))
    }
    if (committed.exists(_ >= batchId)) return
    // the incoming DataFrame is streaming-flagged; rewrap its executed
    // rows as a batch DF (the standard V1-sink move) so the table's
    // plain write path plans it. The source plan evaluates ONCE: the
    // rows are copied (UnsafeRow buffers are reused per partition —
    // caching without the copy would alias every row in a partition to
    // its last) and persisted, so the emptiness probe below and the
    // merge/append job both read the cache instead of recomputing the
    // micro-batch (the r14/r15 double-evaluation watch item).
    val rdd = data.queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      addBatchInner(spark, tableOpt, rdd, data.schema, batchId)
    } finally { rdd.unpersist(); () }
  }

  private def addBatchInner(spark: org.apache.spark.sql.SparkSession,
      tableOpt: Option[GraftTable],
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit}
    val batch = GraftStreamBridge.batchDf(spark, rdd, schema)
    val props = Map(GraftTable.TxnAppIdKey -> appId,
      GraftTable.TxnBatchKey -> batchId.toString)
    if (mergeKeys.nonEmpty) {
      // UPDATE mode: the guarded keyed upsert (cdcApply's core) —
      // within-batch latest per key, cross-batch reorder guard against
      // the stored version, delete arm on the latest change rows. An
      // all-stale batch commits nothing (a replay of it is a no-op by
      // emptiness, not by marker).
      if (batch.isEmpty) return
      val latest = graft.operators.Dedup.latest(
        batch, mergeKeys, orderCol, tiebreak)
      val delArm = deleteWhen.map(expr).getOrElse(lit(false))
      tableOpt match {
        case None =>
          val keep = latest.filter(!coalesce(delArm, lit(false)))
          if (!keep.isEmpty) {
            GraftTable.create(spark, dir, dir.getFileName.toString, keep, props)
            ()
          }
        case Some(t) =>
          val fresh = EventStreams.reorderGuarded(latest,
            t.read(), mergeKeys, orderCol, tiebreak)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          try {
            if (!fresh.isEmpty) { t.merge(fresh, mergeKeys, delArm,
              properties = props); () }
          } finally { fresh.unpersist(); () }
      }
      return
    }
    (tableOpt, branch) match {
      case (None, Some(b)) => throw new IllegalStateException(
        s"graft table sink: cannot stage onto branch '$b' of a table " +
          s"that does not exist yet ($dir) — create the table (and the " +
          "branch) before streaming into it")
      case (None, None) =>
        if (batch.isEmpty) return // nothing to create a schema era from
        GraftTable.create(spark, dir, dir.getFileName.toString, batch, props)
        ()
      case (Some(t), Some(b)) =>
        if (!batch.isEmpty) { t.appendBranch(b, batch, properties = props); () }
      case (Some(t), None) =>
        if (complete) { t.replace(batch, properties = props); () }
        else if (!batch.isEmpty) { t.append(batch, properties = props); () }
    }
  }

  override def toString: String =
    s"GraftTableSink($dir${branch.map("@" + _).getOrElse("")})"
}
