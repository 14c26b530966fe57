package graft.warehouse

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized AGGREGATE view: a GraftTable
  * holding `GROUP BY groupCols → count(*), sum(sumCols…)` over a base
  * table, refreshed from the base's row CHANGELOG ([[GraftTable.diff]])
  * instead of re-aggregating the base.
  *
  * Why this exists: at 100 TB the daily "refresh the rollup" job is the
  * difference between re-scanning the table and reading the day's
  * delta. count/sum are ABELIAN — every changelog row applies as a
  * signed delta (+1/+v for an insert, −1/−v for a delete; an upsert's
  * update is delete-of-old + insert-of-new, so a row MIGRATING between
  * groups debits one group and credits the other) — so the refresh
  * reads O(changed files), aggregates the delta, and merges only the
  * TOUCHED groups into the view (groups whose count reaches zero are
  * dropped through the merge's delete arm). Cost is proportional to
  * the change set, never the base.
  *
  * Crash safety (the WAL discipline): state records the APPLIED base
  * snapshot plus a PENDING marker written before the view merge. A
  * crash between marker and merge leaves the view head unmoved — the
  * pending tick is recognized as aborted and recomputed; a crash
  * between merge and the applied-state write leaves the view head
  * moved — the pending tick is recognized as committed and finalized.
  * Either way the delta is applied exactly once. The view table must
  * have no writer other than this maintainer.
  *
  * When the base's history expired past the applied snapshot (or a
  * cut became unresolvable), the refresh degrades loudly to a full
  * rebuild via [[GraftTable.replace]] — one atomic swap, never a
  * drop-then-recreate gap.
  */
final class MaterializedAgg private (
    val base: GraftTable,
    val view: GraftTable,
    groupCols: Seq[String],
    sumCols: Seq[String]) {

  import MaterializedAgg._

  private val statePath: Path = view.dir.resolve("_mv_state.json")

  /** Catch up with the base. Returns the refresh mode actually taken:
    * `fresh` (nothing to do), `incremental` (delta applied), or
    * `rebuild` (history expired — full re-aggregate + atomic swap). */
  def refresh(): String = {
    val st = finishPending(readState(statePath))
    val head = base.currentSnapshotId.getOrElse(
      sys.error(s"base table ${base.name} has no snapshots"))
    if (head == st.applied) return "fresh"
    val delta =
      try base.diff(st.applied, head)
      catch {
        case _: HistoryExpiredException =>
          // the delta is unknowable: rebuild from the base head —
          // replace() is one CAS snapshot, so readers never see a gap
          view.replace(aggregate(base.read(Some(head))))
          writeState(statePath, State(head, 0L, view.currentSnapshotId.get))
          return "rebuild"
      }
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val deltaAgg = delta.groupBy(groupCols.map(col): _*).agg(
      sum(sign).as("_dcnt"),
      sumCols.map(c => sum(col(c) * sign).as(s"_d_$c")): _*)
    // join current totals for ONLY the touched groups; new groups read
    // as zero. The join keys on the view's group columns — proportional
    // to |touched groups|, not |base|.
    val joined = deltaAgg.join(view.read(), groupCols, "left")
    val merged = joined.select(
      groupCols.map(col) ++
        Seq((coalesce(col("cnt"), lit(0L)) + col("_dcnt")).as("cnt")) ++
        sumCols.map(c =>
          (coalesce(col(s"sum_$c"), lit(0L)) + col(s"_d_$c")).as(s"sum_$c")): _*)
    // emptied groups ride the merge's delete arm out of the view
    view.merge(writeStatePendingThen(st, head, merged), groupCols,
      whenMatchedDelete = col("cnt") === 0L)
    writeState(statePath, State(head, 0L, view.currentSnapshotId.get))
    "incremental"
  }

  /** Full re-aggregation of a base cut — the initial materialization
    * and the rebuild path. */
  private def aggregate(rel: DataFrame): DataFrame =
    rel.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Write the pending marker BEFORE the merge commits (see the WAL
    * note in the class doc); returns `merged` untouched. */
  private def writeStatePendingThen(st: State, head: Long,
      merged: DataFrame): DataFrame = {
    writeState(statePath,
      State(st.applied, head, view.currentSnapshotId.get))
    merged
  }

  /** Resolve an interrupted tick: a pending marker whose view head
    * moved means the merge landed (finalize); an unmoved view head
    * means it aborted (discard the marker). */
  private def finishPending(st: State): State = {
    if (st.pending == 0L) return st
    val viewHead = view.currentSnapshotId.getOrElse(0L)
    val fixed =
      if (viewHead > st.viewHead) State(st.pending, 0L, viewHead)
      else State(st.applied, 0L, viewHead)
    writeState(statePath, fixed)
    fixed
  }
}

object MaterializedAgg {

  private[warehouse] final case class State(
      applied: Long, pending: Long, viewHead: Long)

  private def readState(p: Path): State = {
    if (!Files.exists(p)) return State(0L, 0L, 0L)
    val s = Files.readString(p).trim.split(",")
    State(s(0).toLong, s(1).toLong, s(2).toLong)
  }

  private def writeState(p: Path, st: State): Unit = {
    // tmp + atomic move: a torn state file would corrupt the WAL logic
    val tmp = Files.createTempFile(p.getParent, ".mvstate-", ".tmp")
    Files.writeString(tmp, s"${st.applied},${st.pending},${st.viewHead}")
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Materialize the initial view over the base's current snapshot and
    * return the maintainer. `viewDir` must not already hold a table. */
  def create(base: GraftTable, viewDir: Path, viewName: String,
      groupCols: Seq[String], sumCols: Seq[String]): MaterializedAgg = {
    require(groupCols.nonEmpty, "materialized aggregate needs group columns")
    val head = base.currentSnapshotId.getOrElse(
      sys.error(s"base table ${base.name} has no snapshots"))
    val init = base.read(Some(head)).groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
    val view = GraftTable.create(base.spark, viewDir, viewName, init)
      .getOrElse(sys.error(s"view table already exists at $viewDir"))
    val mv = new MaterializedAgg(base, view, groupCols, sumCols)
    writeState(mv.view.dir.resolve("_mv_state.json"),
      State(head, 0L, view.currentSnapshotId.get))
    mv
  }

  /** Re-attach to an existing materialized view. */
  def load(base: GraftTable, viewDir: Path, viewName: String,
      groupCols: Seq[String], sumCols: Seq[String]): MaterializedAgg = {
    val view = GraftTable.load(base.spark, viewDir, viewName)
      .getOrElse(sys.error(s"no view table at $viewDir"))
    new MaterializedAgg(base, view, groupCols, sumCols)
  }
}
