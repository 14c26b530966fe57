package graft.queries

import graft.{Q, T}
import graft.streaming.EventStreams
import graft.warehouse.Connector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Graded Structured-Streaming surface: the micro-batch engine run
  * END-TO-END under the driver's DuckDB oracle — previously visible
  * only to StreamingSpec ("streaming: not driver-gradable" was the one
  * §2B row without a CORRECTNESS entry). The trick is the same one the
  * warehouse queries use for commits: materialize real state inside the
  * query function. Each invocation stages the events table as a
  * multi-file parquet directory, runs a real `readStream` over it with
  * `maxFilesPerTrigger=1` + `Trigger.AvailableNow()` — so the engine
  * executes MANY micro-batches with cross-batch state, not one
  * batch-in-disguise — and returns the terminal result, which a plain
  * batch SQL oracle over the same rows must reproduce exactly.
  *
  * Scale posture: both queries exercise the operators exactly as a
  * cluster deployment would — state-store aggregation partitioned by
  * group key (q94) and foreachBatch copy-on-write upsert into the
  * snapshot-log warehouse (q95). The staging write is the test rig,
  * not the operator.
  */
object Streaming {

  private val ql: Seq[Q] = Seq(
    // ---- q94: watermarked tumbling-window aggregation ----------------
    // Grades EventStreams.tumblingCounts: 8 input files → 8 micro-
    // batches whose per-window partial states must merge across batches
    // (events are NOT time-ordered across files, so nearly every window
    // is touched by several batches). Complete output mode keeps the
    // terminal result equal to the batch aggregation — the determinism
    // the oracle needs; append-mode emission timing is covered by
    // StreamingSpec. round(,4) matches tumblingCounts' own rounding.
    Q("q94_stream_tumbling",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS win_start, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q94_stage")
      T.events(s, d).repartition(8).write.mode("overwrite").parquet(staging)
      val agg = EventStreams.tumblingCounts(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        windowLen = "1 day", watermark = "2 days")
      // memory-sink table names are session-global: unique per
      // invocation, and bounded per process (a few hundred rows each,
      // one per bench/verify pass of this query)
      val sink = "q94_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val sq = agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", Scratch.dir("q94_ckpt"))
        .trigger(Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
      s.table(sink)
        .select(col("win_start").cast("date").as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // ---- q95: streaming CDC apply into the warehouse -----------------
    // Grades EventStreams.cdcApply end-to-end: 8 unordered micro-
    // batches of per-user events upserted copy-on-write into a real
    // snapshot-log table. The graded invariant is the operator's whole
    // contract — the terminal replica equals global keep-latest per key
    // REGARDLESS of batch boundaries (within-batch Dedup.latest + the
    // cross-batch (orderCol, tiebreak) reorder guard + idempotent
    // upserts). The oracle rebuilds keep-latest in one QUALIFY; ts is
    // cast to microseconds on the oracle side to mirror the engine's
    // parquet-ns → timestamp_micros read path, keeping tie domains
    // identical. event_id (unique) breaks ts ties deterministically.
    // 4 staged files, not 8: per-batch cost here is DML fixed overhead
    // (probe, guard join, rewrite, commit), so batch count is the whole
    // bench bill; 4 unordered batches already force the cross-batch
    // guard onto the regress path it exists for.
    Q("q95_stream_cdc",
      """SELECT user_id, event_id, event_type, round(value, 2) AS value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q95_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      val conn = new Connector(s, Scratch.dir("q95_wh"))
      val sq = EventStreams.cdcApply(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        conn, "user_state",
        keyCols = Seq("user_id"), orderCol = "ts", tiebreak = "event_id",
        checkpointDir = Scratch.dir("q95_ckpt"))
      sq.awaitTermination()
      conn.query("user_state")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy("user_id")
    })

  def queries: Seq[Q] = ql
}
