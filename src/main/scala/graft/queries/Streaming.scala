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
  * Scale posture: the queries exercise the operators exactly as a
  * cluster deployment would — state-store aggregation partitioned by
  * group key (q94, q97), stream-stream join state (q98), custom
  * per-key state (q99), and foreachBatch copy-on-write upsert into
  * the snapshot-log warehouse (q95). The staging write is the test
  * rig, not the operator.
  */
object Streaming {

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set:
    * a streaming query's STATE STORE count is fixed at this value per
    * stateful operator per side, and every micro-batch commits every
    * store — for the join/session queries below the state is a few
    * tens of thousands of rows, so 32 stores × batches of commit
    * overhead dominates the actual work. 8 is the partition count
    * you'd pick for this state size on a real cluster too; the
    * previous value is restored before the graded result is consumed
    * (bench/verify run queries sequentially, so nothing else observes
    * the window). */
  private def withShufflePartitions[A](s: org.apache.spark.sql.SparkSession,
      n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Stage time-ordered replay slices in ONE input pass (r21, guide
    * §1.2 step 1 — remove redundant passes).
    *
    * The replay rigs need `staging` to hold one parquet file per slice
    * with file MODIFICATION TIMES increasing in slice order: the file
    * stream source (`maxFilesPerTrigger = 1`) replays files in mtime
    * order, so arrival order == slice order == event-time order at
    * batch granularity. The original rigs got that by writing each
    * slice sequentially — one FULL SCAN of the input per slice (8× for
    * the 8-slice rigs). This writes ALL slices in one partitionBy pass
    * (the slice column is dropped from the data files, exactly like
    * the old per-slice writes), then MOVES the files into `staging` in
    * slice order stamping strictly increasing mtimes IN THE PAST, so
    * anything staged afterwards (q132's sentinel) lands later by
    * construction. Same files, same batches, one scan.
    *
    * Row order WITHIN a slice file may differ from the sequential
    * write's; every consumer below is within-batch order-insensitive
    * (stream-stream join = set semantics; dropDuplicatesWithinWatermark
    * outputs only duplicate-invariant columns; timerSessions sorts per
    * (key, batch); cdcApply keeps latest by a total (ts, event_id)
    * order) and every graded output carries a total ORDER BY. */
  private def stageOrderedSlices(df: org.apache.spark.sql.DataFrame,
      nSlices: Int, staging: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    require(df.columns.contains("__slice"), "stageOrderedSlices needs __slice")
    // Scratch.dir pre-creates the dir; parquet wants a fresh path
    val build = Scratch.dir("slices_build") + "/p"
    df.repartition(nSlices, col("__slice"))
      .write.partitionBy("__slice").parquet(build)
    Files.createDirectories(Paths.get(staging))
    val t0 = System.currentTimeMillis()
    (0 until nSlices).foreach { g =>
      val d = Paths.get(build, s"__slice=$g")
      if (Files.isDirectory(d)) {
        val ls = Files.list(d)
        val fs =
          try ls.iterator().asScala.filter(
            _.getFileName.toString.endsWith(".parquet")).toSeq
            .sortBy(_.getFileName.toString)
          finally ls.close()
        fs.zipWithIndex.foreach { case (f, i) =>
          val dst = Paths.get(staging, f"slice$g%02d_$i%d.parquet")
          Files.move(f, dst, StandardCopyOption.ATOMIC_MOVE)
          // strictly increasing, strictly in the past: slice g gets
          // t0 - (nSlices - g) seconds
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(
              t0 - (nSlices - g) * 1000L))
        }
      }
    }
  }

  /** Land a memory-sink table as parquet under [[Scratch]] and DROP the
    * sink's temp view: a complete-mode sink holds its whole result in
    * driver memory for the session's lifetime, and bench/verify invoke
    * each query 4+ times — without this, every invocation's full result
    * lingers on the heap for the rest of the run. */
  private def landSink(s: org.apache.spark.sql.SparkSession,
      sink: String): org.apache.spark.sql.DataFrame = {
    val landed = Scratch.dir(sink + "_out")
    s.table(sink).write.mode("overwrite").parquet(landed)
    s.catalog.dropTempView(sink)
    s.read.parquet(landed)
  }

  private val ql: Seq[Q] = Seq(
    // ---- q94: watermarked tumbling-window aggregation ----------------
    // Grades EventStreams.tumblingCounts: 4 input files → 4 micro-
    // batches whose per-window partial states must merge across batches
    // (events are NOT time-ordered across files, so nearly every window
    // is touched by several batches — 4 unordered files already
    // guarantee that, the same argument q95/q97/q98/q99 make; the
    // per-micro-batch state-store commit is the whole bench bill, so
    // batch count buys nothing past merge coverage). Complete output
    // mode keeps the terminal result equal to the batch aggregation —
    // the determinism the oracle needs; append-mode emission timing is
    // covered by StreamingSpec. round(,4) matches tumblingCounts' own
    // rounding.
    Q("q94_stream_tumbling",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS win_start, event_type,
        |  count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q94_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      val agg = EventStreams.tumblingCounts(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        windowLen = "1 day", watermark = "2 days")
      // memory-sink table names are session-global: unique per
      // invocation; landSink drops the view (and its held rows) before
      // the query returns
      val sink = "q94_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      withShufflePartitions(s, 8) {
        val sq = agg.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .option("checkpointLocation", Scratch.dir("q94_ckpt"))
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      landSink(s, sink)
        .select(col("win_start").cast("date").as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("win_start", "event_type")
    },

    // ---- q95: streaming CDC apply into the warehouse -----------------
    // Grades EventStreams.cdcApply end-to-end: 4 unordered micro-
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
      withShufflePartitions(s, 8) {
        val sq = EventStreams.cdcApply(
          EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
          conn, "user_state",
          keyCols = Seq("user_id"), orderCol = "ts", tiebreak = "event_id",
          checkpointDir = Scratch.dir("q95_ckpt"))
        sq.awaitTermination()
      }
      conn.query("user_state")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy("user_id")
    },

    // ---- q97: gap-based session windows under streaming state --------
    // Grades EventStreams.userSessions: session_window MERGES state
    // across micro-batches — an event in batch 5 can bridge two
    // sessions opened by batches 1 and 3 into one — which plain window
    // aggs never exercise. Unordered batches force those merges;
    // complete mode keeps the terminal state equal to batch
    // sessionization (no eviction), which the oracle rebuilds with the
    // lag/cumulative-sum idiom. Boundary semantics: session_window's
    // per-event window is [ts, ts+gap) — end EXCLUSIVE — so a gap of
    // exactly 30 min starts a NEW session (>= below, not >), and the
    // gap is compared in exact MICROSECONDS: date_diff('second')
    // counts second-boundary CROSSINGS, not elapsed time, so a
    // 1799.34 s gap can read as 1800 and split a session the engine
    // merges (a real such pair exists in the sf0.1 corpus).
    // Timestamps are graded as epoch MICROSECONDS with the oracle
    // casting ns→µs first, keeping both tie domains identical.
    // 4 staged files: complete mode re-emits the ENTIRE session set to
    // the sink every micro-batch (~1 session/user/day of corpus), so
    // sink traffic — not state work — scales with batch count; 4
    // unordered batches still force cross-batch session merges.
    Q("q97_stream_sessions",
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |        - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)))
        |        >= 1800 * 1000000
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM g)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS sess_end_us,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start_us""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q97_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      // watermark far past the corpus span: staged batches are NOT
      // time-ordered, so a realistic watermark would drop late INPUT
      // rows (confirmed: 2 days loses ~2/3 of the sessions) and the
      // result would depend on file order; late-drop behavior belongs
      // to StreamingSpec, the graded surface is merge correctness
      val sess = EventStreams.userSessions(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        gap = "30 minutes", watermark = "3650 days")
      val sink = "q97_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      withShufflePartitions(s, 8) {
        val sq = sess.writeStream.format("memory").queryName(sink)
          .outputMode("complete")
          .option("checkpointLocation", Scratch.dir("q97_ckpt"))
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      landSink(s, sink)
        .select(col("user_id"),
          unix_micros(col("sess_start")).as("sess_start_us"),
          unix_micros(col("sess_end")).as("sess_end_us"),
          col("n_events"))
        .orderBy("user_id", "sess_start_us")
    },

    // ---- q98: watermarked stream-stream join -------------------------
    // Grades EventStreams.followedBy (view→click within 30 min, same
    // user): BOTH sides buffer keyed state and batches arrive in no
    // time order, so nearly every match pairs rows from different
    // micro-batches. Inner-join results emit as matches are found, so
    // append mode needs no watermark wait; the watermark is set far
    // past the corpus span so no state is evicted mid-run and the
    // terminal output equals the batch range self-join the oracle
    // states (eviction timing is StreamingSpec's job — a tight
    // watermark over UNORDERED files would drop pairs
    // nondeterministically). 4 files per side bound the batch count:
    // join state maintenance is the per-batch cost here. q111 is the
    // production-shaped counterpart: TIME-ORDERED staging makes a
    // finite 1-hour watermark safe and grades that state is evicted.
    Q("q98_stream_join",
      """SELECT a.user_id AS user_id, a.event_id AS a_event,
        |  b.event_id AS b_event,
        |  epoch_us(CAST(a.ts AS TIMESTAMP)) AS a_ts_us,
        |  epoch_us(CAST(b.ts AS TIMESTAMP)) AS b_ts_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'click'
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |ORDER BY user_id, a_event, b_event""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q98_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      val joined = EventStreams.followedBy(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        firstType = "view", thenType = "click",
        maxGap = "30 minutes", watermark = "3650 days")
      val sink = "q98_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      // a stream-stream join keeps FOUR stores per partition (two per
      // side), so halve the partition count again vs the aggregations
      withShufflePartitions(s, 4) {
        val sq = joined.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation", Scratch.dir("q98_ckpt"))
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      landSink(s, sink)
        .select(col("user_id"), col("a_event"), col("b_event"),
          unix_micros(col("a_ts")).as("a_ts_us"),
          unix_micros(col("b_ts")).as("b_ts_us"))
        .orderBy("user_id", "a_event", "b_event")
    },

    // ---- q111: stream-stream join under a FINITE watermark -----------
    // q98 deliberately runs with an effectively-infinite watermark
    // (unordered staging files would otherwise drop rows
    // nondeterministically) — which also means its rig retains ALL
    // join state, the one shape that cannot survive a 100× scale-up.
    // This variant stages the same corpus as 8 TIME-ORDERED slices
    // (day-of-month ranges of the one-month corpus, written
    // sequentially so file modification times follow event time and
    // each micro-batch's minimum ts is >= the previous batch's
    // maximum), which makes a REALISTIC 1-hour watermark safe: the
    // global watermark only advances at batch boundaries, so
    // within-batch disorder never drops input, and any qualifying
    // click lives in a batch at-or-before the one whose completion
    // evicts its view — no lost matches, terminal output still equals
    // the batch self-join the oracle states. The graded witness is
    // the 100-TB property itself: the maximum state-store row count
    // across all micro-batches stays under HALF the qualifying input
    // (in practice ~a 1.5-hour tail per batch; an infinite watermark
    // would hold the entire corpus), proving view/click state is
    // actually evicted while the result stays exact.
    Q("q111_stream_join_watermark",
      """SELECT a.user_id AS user_id, a.event_id AS a_event,
        |  b.event_id AS b_event,
        |  epoch_us(CAST(a.ts AS TIMESTAMP)) AS a_ts_us,
        |  epoch_us(CAST(b.ts AS TIMESTAMP)) AS b_ts_us,
        |  TRUE AS bounded_state_ok
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'view' AND b.event_type = 'click'
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
        | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |ORDER BY user_id, a_event, b_event""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q111_stage")
      val ev = T.events(s, d)
        .filter(col("event_type").isin("view", "click"))
      // 8 single-file slices in event-time order, staged in ONE pass
      // (stageOrderedSlices): the file source replays them as 8
      // micro-batches in modification-time order, so arrival order ==
      // event-time order at batch granularity
      stageOrderedSlices(ev.withColumn("__slice",
        ((dayofmonth(col("ts")) - 1) / 4).cast("int")), 8, staging)
      val joined = EventStreams.followedBy(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        firstType = "view", thenType = "click",
        maxGap = "30 minutes", watermark = "1 hour")
      val sink = "q111_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      var maxState = 0L
      withShufflePartitions(s, 4) {
        val sq = joined.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation", Scratch.dir("q111_ckpt"))
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
        maxState = sq.recentProgress
          .map(p => p.stateOperators.map(_.numRowsTotal).sum)
          .foldLeft(0L)(math.max)
      }
      val qualifying = ev.count()
      val witness = maxState > 0 && maxState * 2 < qualifying
      landSink(s, sink)
        .select(col("user_id"), col("a_event"), col("b_event"),
          unix_micros(col("a_ts")).as("a_ts_us"),
          unix_micros(col("b_ts")).as("b_ts_us"))
        .withColumn("bounded_state_ok", lit(witness))
        .orderBy("user_id", "a_event", "b_event")
    },

    // ---- q99: arbitrary stateful processing (flatMapGroupsWithState) -
    // Grades EventStreams.runningUserTotals, the custom-state shape
    // windowed aggs can't express: per-user state carried across
    // micro-batches, one cumulative emission per batch a user appears
    // in. The append-mode sink therefore holds a PREFIX LADDER of
    // totals per user; n_events is strictly increasing along it, so
    // max_by(n_events) selects the terminal state, which must equal
    // the batch aggregate the oracle states. Rounding to 2 absorbs the
    // batch-order-vs-single-sum double accumulation difference (~1e-12
    // relative; same rule as every graded double agg).
    Q("q99_stream_running_totals",
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val staging = Scratch.dir("q99_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      val totals = EventStreams.runningUserTotals(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1)
          .as[EventStreams.Event])
      val sink = "q99_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      withShufflePartitions(s, 8) {
        val sq = totals.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation", Scratch.dir("q99_ckpt"))
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      landSink(s, sink)
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          round(expr("max_by(total_value, n_events)"), 2).as("total_value"))
        .orderBy("user_id")
    },

    // ---- q126: streaming key-dedup under at-least-once redelivery ----
    // The ingestion-front-door shape: an at-least-once source redelivers
    // a third of the corpus, each retry RESTAMPED 1 s later — so
    // dedupEvents' (id, ts) composite key can never collapse it (the
    // StreamingSpec differential pins that); only key-only dedup with
    // watermark-bounded state (dropDuplicatesWithinWatermark) both
    // dedups the drifted retry AND evicts state as the watermark
    // passes. Staging replays time-ordered (q111's slice rig) with each
    // retry landing in its original's batch, within the 1 h watermark.
    // Output carries the duplicate-invariant columns (which copy
    // survives is engine-internal; its payload is identical). The
    // witness is the 100-TB property: max state rows across batches
    // stays under half the delivered input — keys are evicted, not
    // accumulated, while the terminal result still equals the exact
    // distinct set.
    Q("q126_stream_dedup",
      """SELECT event_id, user_id, event_type, round(value, 2) AS value,
        |  TRUE AS dedup_state_ok
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q126_stage")
      val ev = T.events(s, d)
      // 8 slices in event-time order staged in ONE pass; each slice
      // delivers its events plus restamped retries of every third
      // event. The retry's slice derives from its ORIGINAL ts (it must
      // land in its original's batch even when the +1 s restamp
      // crosses the slice's day boundary).
      val sliced = ev.withColumn("__slice",
        ((dayofmonth(col("ts")) - 1) / 4).cast("int"))
      val retries = sliced.filter(col("event_id") % 3 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND"))
      stageOrderedSlices(sliced.unionByName(retries), 8, staging)
      val deduped = EventStreams.dedupWithinWatermark(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
        keys = Seq("event_id"), watermark = "1 hour")
      val sink = "q126_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      var maxState = 0L
      withShufflePartitions(s, 4) {
        val sq = deduped.writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .option("checkpointLocation", Scratch.dir("q126_ckpt"))
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
        maxState = sq.recentProgress
          .map(p => p.stateOperators.map(_.numRowsTotal).sum)
          .foldLeft(0L)(math.max)
      }
      val delivered = ev.count() + ev.filter(col("event_id") % 3 === 0).count()
      val witness = maxState > 0 && maxState * 2 < delivered
      landSink(s, sink)
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .withColumn("dedup_state_ok", lit(witness))
        .orderBy("event_id")
    },

    // ---- q129: arbitrary state through the NEW transformWithState API -
    // The Spark-4 replacement for flatMapGroupsWithState: a
    // StatefulProcessor with TYPED state variables (ValueState here;
    // list/map/TTL/timers in the API) over the RocksDB state-store
    // backend, which TWS requires — the rig switches the provider for
    // the run and restores it. Same graded contract as q99 (terminal
    // running totals == the batch aggregate across 4 unordered
    // micro-batches), so the grade isolates exactly the new
    // operator+backend path: a TWS or RocksDB regression mismatches
    // while q99 (HDFS-backed FMGWS) stays green.
    Q("q129_stream_tws",
      """SELECT user_id, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val staging = Scratch.dir("q129_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      val totals = EventStreams.runningUserTotalsTws(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1)
          .as[EventStreams.Event])
      val sink = "q129_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.getOption(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        withShufflePartitions(s, 8) {
          val sq = totals.writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", Scratch.dir("q129_ckpt"))
            .trigger(Trigger.AvailableNow())
            .start()
          sq.awaitTermination()
        }
      } finally prevProv match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
      landSink(s, sink)
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          round(expr("max_by(total_value, n_events)"), 2).as("total_value"))
        .orderBy("user_id")
    },

    // ---- q132: EVENT-TIME TIMERS (transformWithState sessionization) -
    // The timer half of the TWS API (q129 grades typed state): per-user
    // inactivity-gap sessions where a session closed by a later event
    // emits input-driven, and a session nothing follows emits when its
    // REGISTERED TIMER (last event + 30 min) passes the watermark — the
    // custom-per-session-logic shape session_window cannot host. Staged
    // as q111's time-ordered slices (so a finite 1 h watermark is
    // drop-free) plus a far-future sentinel slice that pushes the final
    // watermark past every real session's horizon — the tail sessions
    // must be emitted BY TIMERS, so a timer regression loses exactly
    // them and hash-mismatches. The oracle restates gap sessionization
    // declaratively at microsecond precision; terminal output must be
    // identical session-for-session.
    Q("q132_stream_timers",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
        |        epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
        |      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sx AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM g)
        |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
        |  epoch_us(CAST(min(ts) AS TIMESTAMP)) AS s_start_us,
        |  epoch_us(CAST(max(ts) AS TIMESTAMP)) AS s_end_us,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM sx GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val staging = Scratch.dir("q132_stage")
      val ev = T.events(s, d)
      stageOrderedSlices(ev.withColumn("__slice",
        ((dayofmonth(col("ts")) - 1) / 4).cast("int")), 8, staging)
      // sentinel slice: one far-future event for a user the output
      // filters away; its watermark passes every real timer. Staged
      // AFTER the one-pass slices, whose mtimes are stamped in the
      // past — the sentinel's fresh mtime sorts it last.
      ev.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", col("ts") + expr("INTERVAL 400 DAYS"))
        .coalesce(1).write.mode("append").parquet(staging)
      val sessions = EventStreams.timerSessions(
        EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1)
          .as[EventStreams.Event],
        gapSec = 1800, watermark = "1 hour")
      val sink = "q132_sink_" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = s.conf.getOption(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        withShufflePartitions(s, 4) {
          val sq = sessions.writeStream.format("memory").queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", Scratch.dir("q132_ckpt"))
            .trigger(Trigger.AvailableNow())
            .start()
          sq.awaitTermination()
        }
      } finally prevProv match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
      import org.apache.spark.sql.expressions.Window
      landSink(s, sink)
        .filter(col("user_id") =!= -1L)
        .withColumn("sess_id", row_number().over(
          Window.partitionBy("user_id").orderBy("s_start_us")).cast("long"))
        .select("user_id", "sess_id", "s_start_us", "s_end_us", "n_events")
        .orderBy("user_id", "sess_id")
    },

    // ---- q133: EXACTLY-ONCE streaming ingestion under crash-replay ---
    // Grades the txn-marker sink protocol (EventStreams.
    // ingestBatchExactlyOnce): every foreachBatch append records its
    // (checkpoint, batchId) in the commit's snapshot summary, and a
    // batch whose id is at-or-below the table's last marker no-ops.
    // The rig runs a real 4-micro-batch ingest to completion, then
    // SIMULATES the crash window (failure between append and
    // checkpoint advance — Structured Streaming then re-runs the same
    // batch with the same id) by invoking the sink body again with the
    // final batchId AND with an earlier one. Without the skip the
    // replays would re-append (the reference's mirror does exactly
    // that on re-sync, `icerunner.py:1042-1076`) and the hash against
    // the plain events oracle would fail on the doubled rows; the
    // witness additionally pins that the replays committed NO new
    // snapshot.
    Q("q133_exactly_once_ingest",
      """SELECT event_id, user_id, event_type, round(value, 2) AS value,
        |  TRUE AS replay_noop_ok
        |FROM events
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q133_stage")
      T.events(s, d).repartition(4).write.mode("overwrite").parquet(staging)
      val conn = new Connector(s, Scratch.dir("q133_wh"))
      val ckpt = Scratch.dir("q133_ckpt")
      withShufflePartitions(s, 8) {
        val sq = EventStreams.ingestToWarehouse(
          EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
          conn, "events_ingested", ckpt)
        sq.awaitTermination()
      }
      val t = conn.loadTable("events_ingested")
      val headBefore = t.currentSnapshotId.get
      val lastBatch = t.lastTxnBatch(EventStreams.txnAppId(ckpt)).get
      // crash-replay 1: the final batch re-runs with its own id (the
      // exact shape of a crash between commit and checkpoint advance).
      // The replayed content is the whole staged corpus — maximally
      // sensitive: any failure of the skip doubles the table.
      EventStreams.ingestBatchExactlyOnce(conn, "events_ingested", ckpt,
        s.read.parquet(staging), lastBatch)
      // crash-replay 2: an older batch id (restart from a stale
      // checkpoint) must equally no-op — markers are monotone
      EventStreams.ingestBatchExactlyOnce(conn, "events_ingested", ckpt,
        s.read.parquet(staging), 0L)
      val headAfter = conn.loadTable("events_ingested").currentSnapshotId.get
      val witness = headAfter == headBefore && lastBatch >= 3L
      conn.query("events_ingested")
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .withColumn("replay_noop_ok", lit(witness))
        .orderBy("event_id")
    },

    // ---- q143: exactly-once CDC apply under crash-replay -------------
    // The q133 protocol graded through the SECOND sink: cdcApply with
    // a DELETE arm (a user whose latest event is a purchase churns
    // out of the state table) runs 4 real micro-batches, then the rig
    // replays both the final batch and a stale one through the sink
    // body. The txn markers must make both replays byte-level no-ops
    // — witnessed by the replica's snapshot head not moving — because
    // a replayed DELETE batch is the case upsert idempotence cannot
    // save (see cdcBatchExactlyOnce: after a later re-insert, a
    // same-version replayed tombstone would re-delete the key). The
    // terminal state hash-matches the global keep-latest-with-churn
    // oracle regardless of batch boundaries.
    Q("q143_exactly_once_cdc",
      """WITH latest AS (
        |  SELECT user_id, event_id, event_type, round(value, 2) AS value
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) = 1)
        |SELECT user_id, event_id, event_type, value, TRUE AS cdc_xo_ok
        |FROM latest WHERE event_type <> 'purchase'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val staging = Scratch.dir("q143_stage")
      // TIME-ORDERED slices (q111's rig): tombstones are not persisted
      // (GraftTable.merge scaladoc), so a batch arriving after a
      // delete must only carry NEWER events for the semantics to be
      // batch-boundary-independent — day-ordered staging guarantees it
      val ev = T.events(s, d)
      stageOrderedSlices(ev.withColumn("__slice",
        ((dayofmonth(col("ts")) - 1) / 8).cast("int")), 4, staging)
      val conn = new Connector(s, Scratch.dir("q143_wh"))
      val ckpt = Scratch.dir("q143_ckpt")
      val delArm = Some(col("event_type") === "purchase")
      withShufflePartitions(s, 8) {
        val sq = EventStreams.cdcApply(
          EventStreams.readEvents(s, staging, maxFilesPerTrigger = 1),
          conn, "user_state",
          keyCols = Seq("user_id"), orderCol = "ts", tiebreak = "event_id",
          checkpointDir = ckpt, deleteWhen = delArm)
        sq.awaitTermination()
      }
      val t = conn.loadTable("user_state")
      val headBefore = t.currentSnapshotId.get
      val lastBatch = t.lastTxnBatch(EventStreams.txnAppId(ckpt)).get
      // crash-replays: the final batch under its own id, then a stale
      // one — both must no-op without committing
      EventStreams.cdcBatchExactlyOnce(conn, "user_state",
        Seq("user_id"), "ts", "event_id", ckpt, delArm,
        s.read.parquet(staging), lastBatch)
      EventStreams.cdcBatchExactlyOnce(conn, "user_state",
        Seq("user_id"), "ts", "event_id", ckpt, delArm,
        s.read.parquet(staging), 0L)
      val headAfter = conn.loadTable("user_state").currentSnapshotId.get
      val witness = headAfter == headBefore && lastBatch >= 3L
      conn.query("user_state")
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .withColumn("cdc_xo_ok", lit(witness))
        .orderBy("user_id")
    },

    // ---- q145: warehouse table as a Structured Streaming SOURCE ------
    // Grades graft.streaming.GraftTableSource — the Delta streaming-
    // source shape: `spark.readStream` over a GraftTable with offsets =
    // SNAPSHOT IDS and batches = changesSince deltas. Three real
    // readStream runs share ONE checkpoint: run 1 consumes the initial
    // snapshot; between runs the source table takes an append, a
    // PARTIAL BINPACK compaction (a `rewrite` snapshot the incremental
    // read must flow THROUGH — its re-housed rows must not re-deliver),
    // and a second append; run 2 must deliver EXACTLY the two appended
    // slices (with maxSnapshotsPerBatch=1 forcing one source commit
    // per micro-batch — real multi-batch consumption, not one batch in
    // disguise); run 3, with no new commits, must deliver ZERO rows —
    // the offset-replay witness (restart from checkpoint re-reads
    // nothing). The union of everything delivered must hash-equal the
    // plain orders oracle: a duplicated or dropped delta cannot pass.
    Q("q145_table_stream_source",
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, TRUE AS src_ok
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q145_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      val t = graft.warehouse.GraftTable.create(s, wh.resolve("orders_src"),
        "orders_src", orders.filter(col("o_orderkey") % 3 === 0)).get
      val ckpt = Scratch.dir("q145_ckpt")
      val outDir = Scratch.dir("q145_out")
      val runRows = new java.util.concurrent.atomic.AtomicLong()
      def runStream(): Long = {
        runRows.set(0L)
        withShufflePartitions(s, 8) {
          val sq = s.readStream
            .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
            .option("path", wh.resolve("orders_src").toString)
            .option("maxSnapshotsPerBatch", "1")
            .load()
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              runRows.addAndGet(b.count())
              b.write.mode("append").parquet(outDir): Unit
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          sq.awaitTermination()
        }
        runRows.get()
      }
      val c0 = t.read().count()
      val rows1 = runStream() // initial snapshot
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.compactSmall(smallBytes = 1L << 30) // binpack: rewrite flows through
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      val c1 = orders.filter(col("o_orderkey") % 3 === 1).count()
      val c2 = orders.filter(col("o_orderkey") % 3 === 2).count()
      val rows2 = runStream() // exactly the two appended slices
      val rows3 = runStream() // nothing new: re-reads NOTHING
      val witness = rows1 == c0 && rows2 == c1 + c2 && rows3 == 0L
      s.read.parquet(outDir)
        .withColumn("src_ok", lit(witness))
        .orderBy("o_orderkey")
    },

    // ---- q150: warehouse table as a Structured Streaming SINK --------
    // Grades graft.streaming.GraftTableSink — the write-side twin of
    // q145, closing the first-class readStream/writeStream pair: a
    // LAKE-TO-LAKE pipeline streams one GraftTable into another with
    // `.writeStream.format(sink)` and NO foreachBatch wiring. Three
    // runs share one checkpoint: run 1 lands the initial snapshot
    // (creating the sink table, txn-marked batch 0); two source
    // appends later, run 2 must commit EXACTLY one sink snapshot per
    // source commit (maxSnapshotsPerBatch=1 ⇒ two micro-batches ⇒ two
    // txn-marked appends — downstream changesSince consumers see each
    // batch); run 3, idle, must commit NOTHING (not even an empty
    // snapshot). Then a crash-replay drives the sink body directly
    // with a stale batchId — the transaction marker must no-op it
    // BEFORE any write (the at-least-once window the reference's
    // writer loop leaves open, icerunner.py:848-906). The sink table
    // hash-matches the plain orders oracle: a duplicated or dropped
    // batch cannot pass.
    Q("q150_table_stream_sink",
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, TRUE AS sink_ok
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q150_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      val src = graft.warehouse.GraftTable.create(s, wh.resolve("src"),
        "src", orders.filter(col("o_orderkey") % 3 === 0)).get
      val ckpt = Scratch.dir("q150_ckpt")
      val dstDir = wh.resolve("dst")
      def runStream(): Unit = withShufflePartitions(s, 8) {
        val sq = s.readStream
          .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
          .option("path", wh.resolve("src").toString)
          .option("maxSnapshotsPerBatch", "1")
          .load()
          .writeStream
          .format(classOf[graft.streaming.GraftTableSinkProvider].getName)
          .option("path", dstDir.toString)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      runStream() // initial snapshot creates the sink table
      src.append(orders.filter(col("o_orderkey") % 3 === 1))
      src.append(orders.filter(col("o_orderkey") % 3 === 2))
      runStream() // one sink commit PER source commit
      val dst = graft.warehouse.GraftTable.load(s, dstDir, "dst").get
      val snapsAfter2 = dst.log.snapshots.size
      val headAfter2 = dst.currentSnapshotId.get
      runStream() // idle: zero commits
      val idleOk = dst.currentSnapshotId.get == headAfter2
      // crash-replay a stale batch id straight through the sink body
      val appId = graft.streaming.EventStreams.txnAppId(ckpt)
      new graft.streaming.GraftTableSink(dstDir, appId, complete = false)
        .addBatch(0L, orders.limit(5))
      val replayOk = dst.currentSnapshotId.get == headAfter2
      val marked = dst.log.snapshots.forall(
        _.properties.contains(graft.warehouse.GraftTable.TxnBatchKey))
      val witness = snapsAfter2 == 3 && idleOk && replayOk && marked
      dst.read().withColumn("sink_ok", lit(witness))
        .orderBy("o_orderkey")
    },

    // ---- q169: sink UPDATE mode — keyed streaming upsert --------------
    // Grades GraftTableSink's Update mode (what a Delta user writes as
    // `outputMode("update")` before discovering foreachBatch):
    // options mergeKeys/orderCol/deleteWhen route every micro-batch
    // through the guarded keyed upsert. The rig streams a VERSIONED
    // changelog whose third commit REDELIVERS AN OLDER VERSION (ver 2
    // arriving after ver 3 — separate micro-batches under
    // maxSnapshotsPerBatch=1): the reorder guard must drop it without
    // committing anything, so the replica converges to the newest
    // version despite out-of-order delivery; a ver-4 delete batch
    // drops its keys through the deleteWhen arm. Witnesses: the sink
    // log is exactly create + merge + merge (the stale batch committed
    // NOTHING), an idle rerun commits nothing, and a crash-replayed
    // stale batchId no-ops on the txn marker BEFORE any write —
    // exactly-once, not at-least-once.
    Q("q169_sink_update",
      """WITH base AS (
        |  SELECT o_orderkey AS k, round(o_totalprice, 2) AS p FROM orders)
        |SELECT k,
        |  CASE WHEN k % 5 = 1 THEN round(p * 2, 2) ELSE p END AS price,
        |  CAST(CASE WHEN k % 5 = 1 THEN 3 ELSE 1 END AS BIGINT) AS ver,
        |  'U' AS op, TRUE AS upd_ok
        |FROM base WHERE k % 7 <> 2 ORDER BY k""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q169_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey").as("k"),
        round(col("o_totalprice"), 2).as("price"))
      val v1 = orders.withColumn("ver", lit(1L)).withColumn("op", lit("U"))
      val src = graft.warehouse.GraftTable.create(s, wh.resolve("src"),
        "src", v1).get
      src.append(orders.filter(col("k") % 5 === 1)          // ver 3: wins
        .withColumn("price", round(col("price") * 2, 2))
        .withColumn("ver", lit(3L)).withColumn("op", lit("U")))
      src.append(orders.filter(col("k") % 5 === 1)          // STALE ver 2
        .withColumn("price", round(col("price") * 100, 2))  // must lose
        .withColumn("ver", lit(2L)).withColumn("op", lit("U")))
      src.append(orders.filter(col("k") % 7 === 2)          // ver 4: delete
        .withColumn("ver", lit(4L)).withColumn("op", lit("D")))
      val ckpt = Scratch.dir("q169_ckpt")
      val dstDir = wh.resolve("dst")
      def runStream(): Unit = withShufflePartitions(s, 8) {
        val sq = s.readStream
          .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
          .option("path", wh.resolve("src").toString)
          .option("maxSnapshotsPerBatch", "1")
          .load()
          .writeStream
          .format(classOf[graft.streaming.GraftTableSinkProvider].getName)
          .outputMode("update")
          .option("path", dstDir.toString)
          .option("mergeKeys", "k")
          .option("orderCol", "ver")
          .option("deleteWhen", "op = 'D'")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      runStream()
      val dst = graft.warehouse.GraftTable.load(s, dstDir, "dst").get
      val head1 = dst.currentSnapshotId.get
      val ops1 = dst.log.snapshots.map(_.operation)
      runStream() // idle: zero commits
      val idleOk = dst.currentSnapshotId.get == head1
      // crash-replay a stale batch straight through the sink body — a
      // replayed DELETE batch is the non-idempotent case the marker
      // must no-op before any write
      val appId = graft.streaming.EventStreams.txnAppId(ckpt)
      new graft.streaming.GraftTableSink(dstDir, appId, complete = false,
        mergeKeys = Seq("k"), orderCol = "ver", tiebreak = "ver",
        deleteWhen = Some("op = 'D'"))
        .addBatch(1L, v1.limit(7))
      val replayOk = dst.currentSnapshotId.get == head1
      val shapeOk = ops1 == Seq("create", "merge", "merge")
      val witness = idleOk && replayOk && shapeOk && dst.validate().isEmpty
      dst.read().select(col("k"), col("price"), col("ver"), col("op"))
        .withColumn("upd_ok", lit(witness))
        .orderBy("k")
    },

    // ---- q154: stream-source admission control -----------------------
    // Grades the r14 source options together: `startingSnapshotId`
    // (Delta's startingVersion — the consumer declares it already
    // holds the table at that cut, so the FIRST batch is the delta
    // since it, not the initial snapshot) and `maxBytesPerBatch`
    // (Delta's maxBytesPerTrigger — admission budgeted by each
    // commit's RECORDED added-file bytes; commit sizes vary 1000×, so
    // the byte budget is what actually bounds executor memory when a
    // long-idle consumer drains its backlog under
    // Trigger.AvailableNow). A 1-byte budget forces the MINIMUM
    // admission — exactly one source commit per micro-batch — so the
    // witness pins: no initial-snapshot rows delivered (the % 3 == 0
    // stratum never appears), one batch per post-cut commit, and an
    // idle restart delivering ZERO rows. The union of delivered
    // batches hash-matches the two post-cut slices.
    Q("q154_stream_admission",
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, TRUE AS adm_ok
        |FROM orders WHERE o_orderkey % 3 <> 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q154_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      val t = graft.warehouse.GraftTable.create(s, wh.resolve("src"),
        "src", orders.filter(col("o_orderkey") % 3 === 0)).get
      val cut = t.currentSnapshotId.get
      t.append(orders.filter(col("o_orderkey") % 3 === 1))
      t.append(orders.filter(col("o_orderkey") % 3 === 2))
      val ckpt = Scratch.dir("q154_ckpt")
      val outDir = Scratch.dir("q154_out")
      val batches = new java.util.concurrent.atomic.AtomicLong()
      val rows = new java.util.concurrent.atomic.AtomicLong()
      def runStream(): Unit = withShufflePartitions(s, 8) {
        val sq = s.readStream
          .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
          .option("path", wh.resolve("src").toString)
          .option("startingSnapshotId", cut.toString)
          .option("maxBytesPerBatch", "1")
          .load()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val n = b.count()
            rows.addAndGet(n)
            if (n > 0) batches.incrementAndGet()
            b.write.mode("append").parquet(outDir): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      runStream()
      val batches1 = batches.get(); val rows1 = rows.get()
      batches.set(0); rows.set(0)
      runStream() // idle: nothing re-read
      val expect = orders.filter(col("o_orderkey") % 3 =!= 0).count()
      val witness = batches1 == 2 && rows1 == expect && rows.get() == 0L
      s.read.parquet(outDir)
        .withColumn("adm_ok", lit(witness))
        .orderBy("o_orderkey")
    },

    // ---- q155: WAP streaming — stage a stream onto a branch ----------
    // Grades the sink's `branch` option (Iceberg's `spark.wap.branch`
    // workflow): a stream lands micro-batches on a WAP branch, so MAIN
    // readers never observe a single row until an auditor validates
    // the branch view and publishes the whole staged run as ONE atomic
    // commit — the quality-gated continuous load. Witness pins: main
    // frozen at the pre-stream state while the branch view holds
    // everything (per-batch staged commits with txn markers), the
    // audit gate passing on the BRANCH view, exactly one `publish`
    // snapshot landing both micro-batches, and a crash-replay arriving
    // AFTER publish+drop no-oping off the carried markers (head
    // unmoved, no branch resurrected). Hash grades the published
    // state against plain orders.
    Q("q155_wap_stream",
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, TRUE AS wap_ok
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q155_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      val t = graft.warehouse.GraftTable.create(s, wh.resolve("t"), "t",
        orders.filter(col("o_orderkey") % 3 === 0)).get
      val preMain = t.read().count()
      t.createBranch("audit")
      val staging = Scratch.dir("q155_stage")
      orders.filter(col("o_orderkey") % 3 === 1).coalesce(1)
        .write.mode("append").parquet(staging)
      orders.filter(col("o_orderkey") % 3 === 2).coalesce(1)
        .write.mode("append").parquet(staging)
      val ckpt = Scratch.dir("q155_ckpt")
      withShufflePartitions(s, 8) {
        val sq = s.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("o_orderkey",
              orders.schema("o_orderkey").dataType),
            org.apache.spark.sql.types.StructField("price",
              org.apache.spark.sql.types.DoubleType))))
          .option("maxFilesPerTrigger", "1")
          .parquet(staging)
          .writeStream
          .format(classOf[graft.streaming.GraftTableSinkProvider].getName)
          .option("path", wh.resolve("t").toString)
          .option("branch", "audit")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        sq.awaitTermination()
      }
      // staging invisible to main; the AUDIT runs on the branch view
      val mainFrozen = t.read().count() == preMain
      val auditPassed =
        t.readBranch("audit").filter(col("price") < 0).isEmpty
      val total = orders.count()
      val branchComplete = t.readBranch("audit").count() == total
      val staged = new graft.warehouse.SnapshotLog(
        wh.resolve("t"), Some("audit")).snapshots.size
      val pub = t.publishBranch("audit")
      // post-publish crash-replay: carried markers no-op it
      val head = t.currentSnapshotId.get
      new graft.streaming.GraftTableSink(wh.resolve("t"),
        graft.streaming.EventStreams.txnAppId(ckpt),
        complete = false, branch = Some("audit"))
        .addBatch(0L, orders.limit(5))
      val replayOk = t.currentSnapshotId.get == head && t.branches.isEmpty
      val witness = mainFrozen && auditPassed && branchComplete &&
        staged == 2 && pub.operation == "publish" && replayOk
      t.read().withColumn("wap_ok", lit(witness))
        .orderBy("o_orderkey")
    },

    // ---- q157: STREAMING change-data-feed consumption ----------------
    // r14. q145's append-only stream FAILS on any commit that rewrites
    // or deletes rows (changesSince refuses — correct but terminal:
    // the consumer must full-re-sync). With `readChangeFeed` the same
    // source delivers every commit as its per-commit row-level change
    // set (GraftTable.changeFeed): updates arrive as pre/post image
    // pairs, MOR deletes as delete rows, so a downstream mirror or
    // incremental aggregate can follow DML without ever re-reading the
    // table — Delta's CDF stream shape. The rig streams from
    // startingSnapshotId=1 (the consumer declares it holds the create
    // slice) across an append, a keyed merge doubling k≡0-mod-10, and
    // a predicate MOR delete; maxSnapshotsPerBatch=1 forces one source
    // commit per micro-batch. Witnesses: exactly 3 non-empty batches,
    // each covering EXACTLY ONE commit id; an idle restart delivers
    // zero rows; the MOR delete wrote zero data files yet arrived as
    // real delete rows.
    Q("q157_cdf_stream",
      """WITH o AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS p
        |           FROM orders)
        |SELECT * FROM (
        |  SELECT CAST(2 AS BIGINT) AS sid, 'insert' AS ctype,
        |         k AS o_orderkey, p AS price, TRUE AS cdf_ok
        |  FROM o WHERE k % 2 = 1
        |  UNION ALL
        |  SELECT 3, 'update_preimage', k, p, TRUE FROM o WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT 3, 'update_postimage', k, round(p * 2, 2), TRUE
        |  FROM o WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT 4, 'delete', k,
        |         CASE WHEN k % 10 = 0 THEN round(p * 2, 2) ELSE p END, TRUE
        |  FROM o WHERE k % 3 = 1
        |) ORDER BY sid, ctype, o_orderkey""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q157_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      val t = graft.warehouse.GraftTable.create(s, wh.resolve("orders_cdf"),
        "orders_cdf", orders.filter(col("o_orderkey") % 2 === 0)).get // s1
      t.append(orders.filter(col("o_orderkey") % 2 === 1))            // s2
      val m = t.merge(orders.filter(col("o_orderkey") % 10 === 0)     // s3
          .withColumn("price", round(col("price") * 2, 2)),
        Seq("o_orderkey"), whenMatchedDelete = lit(false))
      val d1 = t.deleteWhereMor(col("o_orderkey") % 3 === 1)          // s4
      val ckpt = Scratch.dir("q157_ckpt")
      val outDir = Scratch.dir("q157_out")
      val batches = new java.util.concurrent.atomic.AtomicLong()
      val oneSidPerBatch = new java.util.concurrent.atomic.AtomicBoolean(true)
      def runStream(): Long = {
        batches.set(0L)
        withShufflePartitions(s, 8) {
          val sq = s.readStream
            .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
            .option("path", wh.resolve("orders_cdf").toString)
            .option("maxSnapshotsPerBatch", "1")
            .option("startingSnapshotId", "1")
            .option("readChangeFeed", "true")
            .load()
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              val sids = b.select("_commit_snapshot_id").distinct().count()
              if (sids > 1) oneSidPerBatch.set(false)
              if (sids > 0) batches.incrementAndGet()
              b.write.mode("append").parquet(outDir): Unit
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          sq.awaitTermination()
        }
        batches.get()
      }
      val b1 = runStream() // s2/s3/s4, one commit per batch
      val b2 = runStream() // idle restart: nothing re-delivered
      val witness = b1 == 3 && b2 == 0 && oneSidPerBatch.get() &&
        d1.addedFiles.isEmpty && d1.deleteFiles.isEmpty &&
        m.properties.contains(graft.warehouse.GraftTable.DmlKeysKey)
      s.read.parquet(outDir)
        .select(col("_commit_snapshot_id").as("sid"),
          col("_change_type").as("ctype"), col("o_orderkey"), col("price"))
        .withColumn("cdf_ok", lit(witness))
        .orderBy("sid", "ctype", "o_orderkey")
    },

    // ---- q164: STREAMING IDENTITY feed (CDF × row lineage) ----------
    // q157's CDF stream with `withRowIds`: every streamed change row
    // carries its stable _row_id, a MERGE's pre/post images arrive
    // sharing the PRESERVED identity (matched rows inherit the stored
    // id; survivors cancel), and MOR-delete rows name exactly the
    // identities they killed — a downstream consumer can maintain a
    // row-identity index across DML without unique keys. Witnesses:
    // one commit per batch; zero pre/post pairs with mismatched ids;
    // every streamed delete id equal to the pre-delete lineage
    // capture; an idle restart delivers nothing. The oracle checks the
    // VALUE content (ids are layout-dependent and stay out of the
    // graded columns; the witnesses pin them).
    Q("q164_identity_stream",
      """WITH o AS (SELECT o_orderkey AS k, round(o_totalprice, 2) AS p
        |           FROM orders)
        |SELECT * FROM (
        |  SELECT CAST(3 AS BIGINT) AS sid, 'insert' AS ctype,
        |         k AS o_orderkey, p AS price, TRUE AS ic_ok
        |  FROM o WHERE k % 2 = 1
        |  UNION ALL
        |  SELECT 4, 'update_preimage', k, p, TRUE FROM o WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT 4, 'update_postimage', k, round(p * 2, 2), TRUE
        |  FROM o WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT 5, 'delete', k,
        |         CASE WHEN k % 10 = 0 THEN round(p * 2, 2) ELSE p END, TRUE
        |  FROM o WHERE k % 3 = 1
        |) ORDER BY sid, ctype, o_orderkey""".stripMargin) { (s, d) =>
      val wh = java.nio.file.Paths.get(Scratch.dir("q164_wh"))
      val orders = T.orders(s, d).select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      val t = graft.warehouse.GraftTable.create(s, wh.resolve("orders_ic"),
        "orders_ic", orders.filter(col("o_orderkey") % 2 === 0)).get // s1
      t.enableRowLineage()                                           // s2
      t.append(orders.filter(col("o_orderkey") % 2 === 1))           // s3
      val m = t.merge(orders.filter(col("o_orderkey") % 10 === 0)    // s4
          .withColumn("price", round(col("price") * 2, 2)),
        Seq("o_orderkey"), whenMatchedDelete = lit(false))
      // lineage at the pre-delete cut — what the streamed kills must name
      val linPre = t.readLineage(Some(m.snapshotId))
        .select(col("o_orderkey"), col("_row_id").as("__lid"))
      t.deleteWhereMor(col("o_orderkey") % 3 === 1)                  // s5
      val ckpt = Scratch.dir("q164_ckpt")
      val outDir = Scratch.dir("q164_out")
      val batches = new java.util.concurrent.atomic.AtomicLong()
      val oneSidPerBatch = new java.util.concurrent.atomic.AtomicBoolean(true)
      def runStream(): Long = {
        batches.set(0L)
        withShufflePartitions(s, 8) {
          val sq = s.readStream
            .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
            .option("path", wh.resolve("orders_ic").toString)
            .option("maxSnapshotsPerBatch", "1")
            .option("startingSnapshotId", "2")
            .option("readChangeFeed", "true")
            .option("withRowIds", "true")
            .load()
            .writeStream
            .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
              val sids = b.select("_commit_snapshot_id").distinct().count()
              if (sids > 1) oneSidPerBatch.set(false)
              if (sids > 0) batches.incrementAndGet()
              b.write.mode("append").parquet(outDir): Unit
            }
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .start()
          sq.awaitTermination()
        }
        batches.get()
      }
      val b1 = runStream()
      val b2 = runStream() // idle restart: nothing re-delivered
      val out = s.read.parquet(outDir)
      // merge pre/post pairs share the PRESERVED identity
      val pairBad = out.filter(col("_change_type") === "update_preimage")
        .select(col("o_orderkey"), col("_row_id").as("__pre"))
        .join(out.filter(col("_change_type") === "update_postimage")
          .select(col("o_orderkey"), col("_row_id").as("__post")),
          "o_orderkey")
        .filter(col("__pre") =!= col("__post")).count() == 0
      // streamed kills name exactly the pre-delete identities
      val killBad = out.filter(col("_change_type") === "delete")
        .join(linPre, "o_orderkey")
        .filter(col("_row_id") =!= col("__lid")).count() == 0
      val witness = b1 == 3 && b2 == 0 && oneSidPerBatch.get() &&
        pairBad && killBad
      out.select(col("_commit_snapshot_id").as("sid"),
          col("_change_type").as("ctype"), col("o_orderkey"), col("price"))
        .withColumn("ic_ok", lit(witness))
        .orderBy("sid", "ctype", "o_orderkey")
    })

  def queries: Seq[Q] = ql
}
