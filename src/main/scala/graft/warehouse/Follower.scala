package graft.warehouse

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Incremental local consumption of a warehouse table — the Spark-first
  * upgrade of the reference's polling reader (`icerunner.py:716-736`),
  * which re-reads and re-counts the FULL table every tick.
  *
  * Each tick feeds `fn` exactly the rows appended since the recorded
  * snapshot (pinned at the head observed at tick start, so a concurrent
  * append is neither missed nor double-fed) and persists the offset
  * AFTER `fn` returns — at-least-once across crashes, like the mirror.
  * When source history has been expired past the recorded offset the
  * delta is unknowable ([[HistoryExpiredException]]); the follower
  * self-heals by re-feeding the full table with `full = true` so the
  * consumer can reset its downstream state, then resumes incrementally.
  */
object Follower {

  final case class Tick(status: String, rows: Long, snapshotId: Long)

  /** One poll tick. `fn(df, full)`: `full = true` means `df` is the
    * whole table (initial feed or post-expiry re-sync) rather than a
    * delta. */
  def followOnce(table: GraftTable, offsetFile: Path)(
      fn: (DataFrame, Boolean) => Unit): Tick = {
    val head = table.currentSnapshotId.getOrElse(0L)
    def feedFull(status: String): Tick = {
      val full = table.read(Some(head))
      fn(full, true)
      writeOffset(offsetFile, head)
      Tick(status, full.count(), head)
    }
    readOffset(offsetFile) match {
      case Some(l) if l == head => Tick("up_to_date", 0L, head)
      case Some(l) =>
        try {
          val delta = table.changesSince(l, head)
          fn(delta, false)
          writeOffset(offsetFile, head)
          Tick("incremental", delta.count(), head)
        } catch {
          case _: HistoryExpiredException => feedFull("full_resync")
        }
      case None => feedFull("full")
    }
  }

  /** Continuous follow loop; `iterations = Some(1)` gives one-shot. */
  def run(table: GraftTable, offsetFile: Path, intervalMs: Long,
      iterations: Option[Int] = None)(
      fn: (DataFrame, Boolean) => Unit): Tick = {
    var i = 0
    var continue = true
    var last = Tick("never", 0L, 0L)
    while (continue) {
      last = followOnce(table, offsetFile)(fn)
      i += 1
      continue = iterations.forall(i < _)
      if (continue) Thread.sleep(intervalMs)
    }
    last
  }

  private def readOffset(p: Path): Option[Long] =
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p).trim
      if (s.isEmpty) None else Some(s.toLong)
    }

  private def writeOffset(p: Path, id: Long): Unit = {
    val tmp = Files.createTempFile(p.getParent, ".offset-", ".tmp")
    Files.writeString(tmp, id.toString)
    // REPLACE is correct for offsets: single follower, last write wins
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
