package graft.streaming

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, GraftStreamBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.StructType

import graft.warehouse.GraftTable

/** Structured Streaming SOURCE over a [[graft.warehouse.GraftTable]] —
  * the Delta/Iceberg streaming-source shape the reference's polling
  * reader approximates by re-reading the FULL table every tick
  * (`icerunner.py:723-736`; our `warehouse.Follower` fixed the
  * re-read but still polls as an API). This makes a warehouse table a
  * first-class `spark.readStream` input:
  *
  * {{{
  * spark.readStream
  *   .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
  *   .option("path", tableDir)           // the GraftTable directory
  *   .option("maxSnapshotsPerBatch", 1)  // optional admission control
  *   .load()
  * }}}
  *
  * Semantics (the Delta streaming-source contract):
  *  - OFFSETS ARE SNAPSHOT IDS. The checkpoint's offset log stores the
  *    last processed snapshot, so a restart resumes exactly where the
  *    previous run committed — nothing is re-read (exactly-once at the
  *    source when paired with an idempotent/txn-marker sink).
  *  - The FIRST batch of a fresh checkpoint is the full table pinned
  *    at the start head (the "initial snapshot"); every later batch is
  *    `changesSince(start, end]` — O(new files), era-projected across
  *    additive schema evolution. Option `startingSnapshotId` (Delta's
  *    startingVersion) skips the initial snapshot: the consumer
  *    declares it already holds the table's state at that cut, and the
  *    first batch is the delta since it — a cut below the retention
  *    horizon fails loudly instead of silently re-reading.
  *  - REWRITE snapshots (partial binpack compaction) flow through:
  *    `changesSince` skips them, so maintenance on the source table
  *    neither duplicates rows nor disturbs the stream. A snapshot that
  *    REWRITES ROWS (merge/delete/replace/rollback) or a merge-on-read
  *    delete makes the delta inexpressible as appended rows —
  *    `changesSince` throws, failing the query loudly (the consumer
  *    must restart from a fresh checkpoint / full re-sync, exactly the
  *    Mirror escalation rule; Delta's source has the same stance
  *    unless told to ignoreChanges).
  *  - `maxSnapshotsPerBatch` bounds how many source commits one
  *    micro-batch may cover (admission control via the v2
  *    `SupportsAdmissionControl.latestOffset` clamp, so it bounds each
  *    BATCH even under `Trigger.AvailableNow`) — at 100 TB a long-idle
  *    consumer must not get its entire backlog as one giant batch.
  *    `maxBytesPerBatch` (Delta's maxBytesPerTrigger) budgets the same
  *    admission by each commit's RECORDED added-file bytes instead of
  *    by count — commit sizes vary 1000× in practice, so a byte budget
  *    is what actually bounds executor memory; both clamps compose
  *    (min wins), the minimum admission is always one commit, and a
  *    commit with unrecorded sizes ends its batch rather than
  *    silently overrunning the budget.
  *  - `readChangeFeed` (Delta's CDF stream): batches are the
  *    PER-COMMIT row-level change feed ([[GraftTable.changeFeed]]) —
  *    table columns plus `_change_type`/`_commit_snapshot_id`/
  *    `_commit_timestamp` — so the stream FLOWS THROUGH
  *    merge/delete/overwrite/MOR-delete commits as tagged change rows
  *    instead of failing, and a downstream consumer can maintain a
  *    mirror or an incremental aggregate from updates and deletes,
  *    not just appends. The initial snapshot (no `startingSnapshotId`)
  *    arrives as one batch of `insert` rows attributed to the pinned
  *    snapshot; maintenance commits (compact/binpack/checkpoint)
  *    contribute zero rows. `withRowIds` (requires `readChangeFeed` +
  *    [[GraftTable.enableRowLineage]]) subscribes to the IDENTITY
  *    feed: every change row carries its stable `_row_id` and update
  *    pre/post images pair by row identity — what a downstream
  *    consumer needs to track rows across rewrites without unique
  *    keys.
  *
  * Scale: offset resolution and file planning are O(manifest)
  * driver-side; the data path is the same pruned vectorized parquet
  * scan every table read uses — no extra copy, no listener state. */
final class GraftTableSourceProvider extends StreamSourceProvider {

  private def load(sqlContext: SQLContext,
      parameters: Map[String, String]): GraftTable = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft streaming source needs option 'path' = table directory"))
    val dir = Paths.get(path)
    GraftTable.load(sqlContext.sparkSession, dir, dir.getFileName.toString)
      .getOrElse(throw new IllegalArgumentException(
        s"no graft table at $path"))
  }

  private def cdfOf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  private def rowIdsOf(parameters: Map[String, String]): Boolean = {
    val on = parameters.get("withRowIds").exists(_.toBoolean)
    require(!on || cdfOf(parameters),
      "option 'withRowIds' needs 'readChangeFeed' — the append-only " +
        "stream has no change rows to attach identities to")
    on
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("graft-table", schema.getOrElse {
      val base = load(sqlContext, parameters).schema
      if (cdfOf(parameters))
        GraftTableSource.cdfSchema(base, rowIdsOf(parameters))
      else base
    })

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val maxSnaps = parameters.get("maxSnapshotsPerBatch").map(_.toLong)
    maxSnaps.foreach(m => require(m > 0, "maxSnapshotsPerBatch must be > 0"))
    val maxBytes = parameters.get("maxBytesPerBatch").map(_.toLong)
    maxBytes.foreach(m => require(m > 0, "maxBytesPerBatch must be > 0"))
    val startAt = parameters.get("startingSnapshotId").map(_.toLong)
    new GraftTableSource(sqlContext, load(sqlContext, parameters),
      maxSnaps, maxBytes, startAt, cdfOf(parameters), rowIdsOf(parameters))
  }
}

object GraftTableSource {
  /** The CDF stream schema: table columns + the change-attribution
    * triplet [[graft.warehouse.GraftTable.changeFeed]] emits —
    * preceded by the stable `_row_id` when the stream subscribes to
    * the IDENTITY feed (`withRowIds`). */
  def cdfSchema(base: StructType, withRowIds: Boolean = false): StructType = {
    import org.apache.spark.sql.types._
    StructType(base.fields ++
      (if (withRowIds) Seq(StructField("_row_id", LongType),
        StructField("_last_updated_sequence_number", LongType)) else Nil) ++
      Seq(StructField("_change_type", StringType),
        StructField("_commit_snapshot_id", LongType),
        StructField("_commit_timestamp", TimestampType)))
  }
}

/** Offset = the snapshot id already processed (inclusive). */
final case class GraftSnapOffset(id: Long) extends V1Offset {
  override def json: String = id.toString
}

final class GraftTableSource(
    sqlContext: SQLContext,
    table: GraftTable,
    maxSnapshotsPerBatch: Option[Long],
    maxBytesPerBatch: Option[Long] = None,
    startingSnapshotId: Option[Long] = None,
    readChangeFeed: Boolean = false,
    withRowIds: Boolean = false)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => OffsetV2}

  override val schema: StructType =
    if (readChangeFeed) GraftTableSource.cdfSchema(table.schema, withRowIds)
    else table.schema

  /** Head captured at `Trigger.AvailableNow` start: the run processes
    * up to here (in maxSnapshotsPerBatch-bounded batches) and stops,
    * even while concurrent commits keep landing — the
    * SupportsTriggerAvailableNow contract. None under other triggers. */
  @volatile private var availableNowCap: Option[Long] = None

  private def idOf(o: OffsetV2): Long =
    o match {
      case GraftSnapOffset(i) => i
      case other => other.json.trim.toLong // SerializedOffset (checkpoint log)
    }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = table.currentSnapshotId

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control (the FileStreamSource pattern — a V1 Source
    * implementing the v2 mixins): the engine calls this per batch with
    * the last planned offset, so the snapshot clamp bounds each BATCH
    * and the run still drains to the AvailableNow cap — the plain-V1
    * `getOffset` clamp could not (the AvailableNow wrapper captures
    * one getOffset as the whole run's end). */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val start = Option(startOffset).map(idOf)
      .orElse(startingSnapshotId).getOrElse(0L)
    val headRaw = table.currentSnapshotId.getOrElse(return null)
    val head = availableNowCap.map(math.min(headRaw, _)).getOrElse(headRaw)
    // the INITIAL batch (fresh checkpoint, start=0) must never clamp
    // below the first RETAINED snapshot: on a table whose early
    // history was expired (checkpoint()+expireSnapshots, firstId=F),
    // read(Some(end<F)) sees an empty visible set — the initial
    // snapshot would be delivered as ZERO rows and offset `end`
    // committed, silently skipping (end==F-1) or permanently wedging
    // (end<F-1) the stream. Floor at F so the first batch is a real
    // pinned read.
    // the floor protects only the FULL-initial-read path; with
    // startingSnapshotId the first batch is a changesSince delta, and
    // a start below the retention horizon must fail LOUDLY there, not
    // be silently bumped past expired history
    val floor =
      if (startOffset == null && startingSnapshotId.isEmpty)
        table.firstSnapshotId.getOrElse(0L)
      else 0L
    val end0 = maxSnapshotsPerBatch
      .map(m => math.min(head, math.max(floor, start + m))).getOrElse(head)
    val end = maxBytesPerBatch match {
      case None => end0
      case Some(budget) =>
        // byte-budgeted admission (Delta's maxBytesPerTrigger): admit
        // source commits in order while their recorded added-file
        // bytes fit the budget. The MINIMUM admission — one snapshot,
        // or the whole initial snapshot up to the floor (a pinned read
        // cannot be split) — always goes through, so the stream can
        // never wedge on one oversized commit. A commit with
        // unrecorded sizes exhausts the budget after admission: the
        // unmeasured cannot be budgeted, so it ends the batch rather
        // than silently overrunning it. O(manifest) driver walk.
        def bytesOf(s: graft.warehouse.Snapshot): Long = {
          val bs = s.addedFiles.map(f => s.stats.get(f).map(_.bytes).getOrElse(-1L))
          if (bs.exists(_ < 0)) Long.MaxValue / 4 else bs.sum
        }
        // SATURATING accumulation: several unmeasured-size commits each
        // contribute the MaxValue/4 sentinel, and a plain `+=` would
        // wrap the accumulator negative — after which every remaining
        // commit passes `acc + b <= budget` and the byte budget
        // silently stops bounding the batch
        def satAdd(a: Long, b: Long): Long = {
          val s = a + b
          if (((a ^ s) & (b ^ s)) < 0L) Long.MaxValue else s
        }
        var end = math.min(head, math.max(floor, start + 1))
        var acc = 0L
        var open = true // admission stops at the FIRST over-budget commit
        table.log.snapshots
          .filter(s => s.snapshotId > start && s.snapshotId <= end0)
          .foreach { s =>
            val b = bytesOf(s)
            if (s.snapshotId <= end) acc = satAdd(acc, b)
            else if (open && satAdd(acc, b) <= budget) {
              acc = satAdd(acc, b); end = s.snapshotId
            }
            else open = false
          }
        end
    }
    GraftSnapOffset(math.max(end, start))
  }

  override def getOffset: Option[V1Offset] =
    table.currentSnapshotId.map(GraftSnapOffset(_))

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endId = idOf(end)
    val spark = sqlContext.sparkSession
    val df0 = start.map(idOf).orElse(startingSnapshotId) match {
      // fresh checkpoint, no starting cut: the initial snapshot,
      // pinned at the batch end — under readChangeFeed it is delivered
      // as one batch of `insert` rows attributed to the pinned
      // snapshot (Delta CDF's initial-snapshot behavior)
      case None =>
        val base =
          if (withRowIds) table.readLineage(Some(endId))
          else table.read(Some(endId))
        if (!readChangeFeed) base
        else {
          val ts = table.log.snapshots.filter(_.snapshotId <= endId)
            .lastOption.map(_.timestampMs).getOrElse(0L)
          base.withColumn("_change_type", lit("insert"))
            .withColumn("_commit_snapshot_id", lit(endId))
            .withColumn("_commit_timestamp",
              lit(new java.sql.Timestamp(ts)))
        }
      // fresh checkpoint WITH startingSnapshotId (Delta's
      // startingVersion): the first batch is already a delta — the
      // consumer declared it has the table's state at that cut
      case Some(sinceId) =>
        if (sinceId >= endId)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        // readChangeFeed: the per-commit row-level feed — unlike
        // changesSince it FLOWS THROUGH merge/delete/overwrite/MOR
        // commits, reporting them as tagged change rows instead of
        // failing the stream (Delta's CDF stream shape)
        else if (readChangeFeed) table.changeFeed(sinceId, endId, withRowIds)
        else table.changesSince(sinceId, endId)
    }
    // bind to the CAPTURED source schema: additive evolution mid-stream
    // null-fills columns the era lacks and drops columns added after
    // the stream started (the consumer's schema is fixed for the run —
    // restart the query to pick up new columns, Delta's rule too)
    val out = df0.select(schema.fields.toSeq.map { f =>
      if (df0.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    GraftStreamBridge.streamingDf(spark, out.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftTableSource(${table.name})"
}
