package graft.queries

import graft.{Q, T}
import graft.service.{FlightClient, FlightService}
import graft.warehouse.Connector
import org.apache.spark.sql.functions._

/** Graded wire-service surface: the socket server, the Arrow IPC codec,
  * and the over-the-wire MERGE exercised END-TO-END under the driver's
  * DuckDB oracle — the last subsystem that was visible only to
  * ServiceSpec. The query starts a REAL `FlightService` on an ephemeral
  * port inside a throwaway warehouse, pushes the orders projection
  * through `do_put` (DataFrame → Arrow IPC over the socket → staged
  * parquet → snapshot commit), applies a keyed `do_upsert` (the wire
  * MERGE the reference's server never implements, `icerunner.py:298`),
  * and reads the table back through `do_get` (snapshot-pinned Arrow
  * stream → bounded spill chunks → DataFrame). A hash match against the
  * plain-SQL oracle proves the codec round-trips values and types
  * bit-faithfully and the service's DML dispatch computes the
  * declarative MERGE semantics.
  *
  * The fetched body is spilled to bounded local chunks by
  * `ArrowCodec.read` BEFORE the call returns, so the server can close
  * in `finally` while the result stays readable; the graded result is
  * landed under [[Scratch]] and the fetch's spill chunks are released
  * via `Fetched.cleanup()` before the query returns — nothing outlives
  * the invocation outside Scratch's JVM-exit sweep.
  */
object Service {

  private val ql: Seq[Q] = Seq(
    // the %8 slice keeps the row-at-a-time data plane (the honest wire
    // cost: toLocalIterator -> Arrow -> socket, both directions) at a
    // bench-proportionate volume; codec fidelity and MERGE semantics are
    // row-count-independent
    Q("q101_wire_roundtrip",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 16 = 0 THEN round(o_totalprice * 3, 2)
        |       ELSE round(o_totalprice, 2) END AS price,
        |  o_orderstatus, o_orderpriority, o_orderdate
        |FROM orders
        |WHERE o_orderkey % 8 = 0
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val conn = new Connector(s, Scratch.dir("run"))
      val svc = new FlightService(conn, 0)
      try {
        val client = new FlightClient(s, "localhost", svc.boundPort)
        val base = T.orders(s, d).filter(col("o_orderkey") % 8 === 0)
          .select(col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"),
            col("o_orderstatus"), col("o_orderpriority"), col("o_orderdate"))
        client.doPut("orders_wire", base)
        val changes = T.orders(s, d)
          .filter(col("o_orderkey") % 16 === 0)
          .select(col("o_orderkey"),
            round(col("o_totalprice") * 3, 2).as("price"),
            col("o_orderstatus"), col("o_orderpriority"), col("o_orderdate"))
        client.doUpsert("orders_wire", changes, Seq("o_orderkey"))
        // materialize the fetched body under Scratch and RELEASE the
        // client-side Arrow spill (Fetched.cleanup) before returning:
        // the spill dir is not Scratch-managed, and the graded result
        // must outlive the fetch
        val fetched = client.doGet("orders_wire")
        val landed = Scratch.dir("q101_out")
        try fetched.df.write.mode("overwrite").parquet(landed)
        finally fetched.cleanup()
        s.read.parquet(landed).orderBy("o_orderkey")
      } finally svc.close()
    },

    // ---- q102: wire mirror replication, incrementality enforced ------
    // Grades Mirror.performSync over a real socket: full sync, then an
    // incremental delta after a source append. The replica's OWN
    // snapshot log is the witness that sync 2 was a true increment:
    // read-as-of the post-full-sync snapshot must see exactly the first
    // slice, and changes-since it exactly the second. A mirror that
    // silently full-resyncs instead (drop + recreate, the reference's
    // only mode — its per-tick re-read, `icerunner.py:1139-1149`)
    // restarts the replica's history, so the as-of cut resolves to the
    // WHOLE table and the hash mismatches. Sliced to %32 strata: the
    // wire data plane is row-at-a-time, and replication mechanics are
    // volume-independent.
    Q("q102_mirror",
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, 'a_full' AS era
        |FROM orders WHERE o_orderkey % 32 = 0
        |UNION ALL
        |SELECT o_orderkey, round(o_totalprice, 2) AS price, 'b_delta' AS era
        |FROM orders WHERE o_orderkey % 32 = 16
        |ORDER BY era, o_orderkey""".stripMargin) { (s, d) =>
      val srcConn = new Connector(s, Scratch.dir("run"))
      val dstConn = new Connector(s, Scratch.dir("run"))
      val svc = new FlightService(srcConn, 0)
      try {
        val client = new FlightClient(s, "localhost", svc.boundPort)
        val state = graft.service.SyncState(Scratch.dir("run"))
        val url = s"grpc://localhost:${svc.boundPort}/orders_src"
        val orders = T.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        srcConn.createTable("orders_src",
          orders.filter(col("o_orderkey") % 32 === 0))
        val r1 = graft.service.Mirror.performSync(
          client, url, "orders_src", dstConn, "orders_dst", state)
        require(r1.status == "full_sync", s"expected full_sync, got ${r1.status}")
        val s1 = dstConn.loadTable("orders_dst").currentSnapshotId
          .getOrElse(sys.error("full sync committed no snapshot"))
        srcConn.insert("orders_src",
          orders.filter(col("o_orderkey") % 32 === 16))
        val r2 = graft.service.Mirror.performSync(
          client, url, "orders_src", dstConn, "orders_dst", state)
        require(r2.status == "incremental", s"expected incremental, got ${r2.status}")
        val t = dstConn.loadTable("orders_dst")
        t.read(asOf = Some(s1)).withColumn("era", lit("a_full"))
          .unionByName(t.changesSince(s1).withColumn("era", lit("b_delta")))
          .orderBy("era", "o_orderkey")
      } finally svc.close()
    },

    // ---- q108: mirror survives a source UPSERT via the changelog ----
    // The rewrite case q102 cannot cover: an upsert breaks append-only
    // increments, and before r10 the mirror's only recourse was a full
    // re-copy. Now the source serves `get_diff` (GraftTable.diff over
    // the wire) and the replica applies delete-of-old + insert-of-new —
    // only the delta crosses the wire. The witness pins all of it: the
    // tick must report `incremental_diff`, the wire delta must be
    // exactly 2·|updates| + |inserts| change rows, and strictly smaller
    // than the source table (i.e. NOT a disguised full copy). The final
    // replica must hash-equal the oracle's reconstruction of the
    // post-upsert source.
    Q("q108_mirror_cdf",
      """SELECT o_orderkey, price, TRUE AS cdf_ok FROM (
        |  SELECT o_orderkey, round(o_totalprice, 2) * 2 AS price
        |  FROM orders WHERE o_orderkey % 128 = 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 16 = 0 AND o_orderkey % 128 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 128 = 8
        |) ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val srcConn = new Connector(s, Scratch.dir("run"))
      val dstConn = new Connector(s, Scratch.dir("run"))
      val svc = new FlightService(srcConn, 0)
      try {
        val client = new FlightClient(s, "localhost", svc.boundPort)
        val state = graft.service.SyncState(Scratch.dir("run"))
        val url = s"grpc://localhost:${svc.boundPort}/orders_cdc"
        val orders = T.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        srcConn.createTable("orders_cdc",
          orders.filter(col("o_orderkey") % 16 === 0))
        val r1 = graft.service.Mirror.performSync(
          client, url, "orders_cdc", dstConn, "orders_cdc_dst", state)
        require(r1.status == "full_sync", s"expected full_sync, got ${r1.status}")
        val updates = orders.filter(col("o_orderkey") % 128 === 0)
          .withColumn("price", col("price") * 2)
        val inserts = orders.filter(col("o_orderkey") % 128 === 8)
        srcConn.upsert("orders_cdc", updates.unionByName(inserts),
          Seq("o_orderkey"))
        val r2 = graft.service.Mirror.performSync(
          client, url, "orders_cdc", dstConn, "orders_cdc_dst", state)
        val expectedDelta = 2 * updates.count() + inserts.count()
        val srcRows = srcConn.count("orders_cdc")
        val witness = r2.status == "incremental_diff" &&
          r2.rowsSynced == expectedDelta && r2.rowsSynced < srcRows
        dstConn.query("orders_cdc_dst")
          .withColumn("cdf_ok", lit(witness))
          .orderBy("o_orderkey")
      } finally svc.close()
    },

    // ---- q122: mirror replays MOR deletes from the op log ------------
    // A source merge-on-read delete changes rows without changing file
    // sets, so both get_changes AND get_diff refuse its window; before
    // the op-log path that meant a full replica rebuild for an O(|keys|)
    // source operation. Now the mirror fetches the source's op log,
    // validates the window (appends + eqdeletes only), and REPLAYS it in
    // order — appends ship rows, deletes ship key tuples, and replaying
    // in sequence preserves the era scoping: the rig re-inserts a
    // deleted stratum at doubled price between two deletes, so a replica
    // that applied deletes out of order (or as one merged set) loses or
    // resurrects rows under the hash. The witness pins the status
    // (incremental_oplog — neither a diff nor a rebuild), the exact wire
    // payload (appended rows + delete keys), and that the payload was a
    // strict fraction of the table.
    Q("q122_mirror_mor",
      """SELECT o_orderkey, price, TRUE AS oplog_ok FROM (
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 40 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice, 2) * 2 AS price
        |  FROM orders WHERE o_orderkey % 40 = 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 4 = 2 AND o_orderkey % 36 <> 2
        |) ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val srcConn = new Connector(s, Scratch.dir("run"))
      val dstConn = new Connector(s, Scratch.dir("run"))
      val svc = new FlightService(srcConn, 0)
      try {
        val client = new FlightClient(s, "localhost", svc.boundPort)
        val state = graft.service.SyncState(Scratch.dir("run"))
        val url = s"grpc://localhost:${svc.boundPort}/orders_mm"
        val orders = T.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        srcConn.createTable("orders_mm",
          orders.filter(col("o_orderkey") % 4 === 0))
        val r1 = graft.service.Mirror.performSync(
          client, url, "orders_mm", dstConn, "orders_mm_dst", state)
        require(r1.status == "full_sync", s"expected full_sync, got ${r1.status}")
        val t = srcConn.loadTable("orders_mm")
        // r13: SOURCE MAINTENANCE inside the replay window — a partial
        // binpack rewrite (before tombstones exist; it refuses them)
        // and a full compact (after, materializing them) must both
        // pass through the op-log replay as ZERO-ROW ops instead of
        // demoting the tick to changelog/rebuild
        val appendedA = orders.filter(col("o_orderkey") % 8 === 2)
        t.append(appendedA)
        val bp = t.compactSmall(smallBytes = 1L << 30)
        val del1 = orders.filter(col("o_orderkey") % 40 === 0)
          .select("o_orderkey")
        t.deleteKeysMor(del1)
        val appendedB = orders.filter(col("o_orderkey") % 8 === 6)
          .unionByName(orders.filter(col("o_orderkey") % 40 === 0)
            .withColumn("price", col("price") * 2))
        t.append(appendedB)
        val del2 = orders.filter(col("o_orderkey") % 36 === 2)
          .select("o_orderkey")
        t.deleteKeysMor(del2)
        t.compact(targetFiles = 4)
        val r2 = graft.service.Mirror.performSync(
          client, url, "orders_mm", dstConn, "orders_mm_dst", state)
        val expectedWire =
          appendedA.count() + appendedB.count() + del1.count() + del2.count()
        val witness = r2.status == "incremental_oplog" &&
          bp.exists(_.operation == "rewrite") &&
          r2.rowsSynced == expectedWire &&
          r2.rowsSynced < srcConn.count("orders_mm")
        dstConn.query("orders_mm_dst")
          .withColumn("oplog_ok", lit(witness))
          .orderBy("o_orderkey")
      } finally svc.close()
    },

    // ---- q113: mirror survives source SCHEMA EVOLUTION incrementally -
    // Before r11 an additive source evolution demoted replication: the
    // append-path insert threw (error tick) and the changelog apply
    // fell back to a full rebuild. Now the mirror evolves the REPLICA
    // in place (nullable adds) on either delta path and keeps
    // streaming increments. The rig evolves the source TWICE — tag
    // before an append (getChanges path), tag2 before an upsert
    // (get_diff path) — and the witness pins the statuses
    // (full_sync → incremental → incremental_diff: neither evolution
    // tick degraded to full_resync), the exact wire-delta sizes
    // (|B| rows, then 2·|C| change rows), and the replica's evolved
    // 4-column schema. The hash grades the content rule everywhere:
    // pre-evolution rows surface NULL in later columns, exactly as
    // the source's own reads do.
    Q("q113_mirror_evolve",
      """SELECT o_orderkey, price, tag, tag2, TRUE AS evo_ok FROM (
        |  SELECT o_orderkey, round(o_totalprice, 2) AS price,
        |         CAST(NULL AS VARCHAR) AS tag, CAST(NULL AS VARCHAR) AS tag2
        |  FROM orders WHERE o_orderkey % 16 = 0 AND o_orderkey % 32 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice, 2) * 2, 'upd', 'u2'
        |  FROM orders WHERE o_orderkey % 32 = 0
        |  UNION ALL
        |  SELECT o_orderkey, round(o_totalprice, 2), 'late',
        |         CAST(NULL AS VARCHAR)
        |  FROM orders WHERE o_orderkey % 16 = 1
        |) ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val srcConn = new Connector(s, Scratch.dir("run"))
      val dstConn = new Connector(s, Scratch.dir("run"))
      val svc = new FlightService(srcConn, 0)
      try {
        val client = new FlightClient(s, "localhost", svc.boundPort)
        val state = graft.service.SyncState(Scratch.dir("run"))
        val url = s"grpc://localhost:${svc.boundPort}/orders_evo"
        val orders = T.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        srcConn.createTable("orders_evo",
          orders.filter(col("o_orderkey") % 16 === 0))
        val r1 = graft.service.Mirror.performSync(
          client, url, "orders_evo", dstConn, "orders_evo_dst", state)
        // evolution 1 (tag) + APPEND: the getChanges path must evolve
        // the replica and stay incremental
        srcConn.loadTable("orders_evo").addColumns(StructType(Seq(
          StructField("tag", StringType, nullable = true))))
        val lateB = orders.filter(col("o_orderkey") % 16 === 1)
          .withColumn("tag", lit("late"))
        srcConn.insert("orders_evo", lateB)
        val r2 = graft.service.Mirror.performSync(
          client, url, "orders_evo", dstConn, "orders_evo_dst", state)
        // evolution 2 (tag2) + UPSERT: the get_diff path must evolve
        // the replica and apply only the changelog
        srcConn.loadTable("orders_evo").addColumns(StructType(Seq(
          StructField("tag2", StringType, nullable = true))))
        val updC = orders.filter(col("o_orderkey") % 32 === 0)
          .withColumn("price", col("price") * 2)
          .withColumn("tag", lit("upd")).withColumn("tag2", lit("u2"))
        srcConn.upsert("orders_evo", updC, Seq("o_orderkey"))
        val r3 = graft.service.Mirror.performSync(
          client, url, "orders_evo", dstConn, "orders_evo_dst", state)
        val witness = r1.status == "full_sync" &&
          r2.status == "incremental" && r2.rowsSynced == lateB.count() &&
          r3.status == "incremental_diff" &&
          r3.rowsSynced == 2 * updC.count() &&
          dstConn.loadTable("orders_evo_dst").schema.fieldNames.toSeq ==
            Seq("o_orderkey", "price", "tag", "tag2")
        dstConn.query("orders_evo_dst")
          .withColumn("evo_ok", lit(witness))
          .orderBy("o_orderkey")
      } finally svc.close()
    },

    // ---- q135: mirror survives source RENAME + DROP incrementally ----
    // q113 covers ADDITIVE evolution; this grades the NON-additive
    // half: the source renames price→amount before one append and
    // drops its note column before another, and the mirror must stay
    // on the `incremental` path both times — it fetches the source's
    // retained schema eras (`get_schema_history`, field ids in the
    // JSON) and REPLAYS the rename/drop on the replica as the same
    // metadata-only evolve commits, instead of demoting a zero-byte
    // source op to a full replica rebuild. The hash grades both
    // sides' era projection: the replica's pre-rename files must
    // surface their data under the NEW name (a name-only read nulls
    // them), and the witness pins statuses, exact per-tick wire-delta
    // sizes, and the replica's terminal 2-column schema.
    Q("q135_mirror_rename",
      """SELECT o_orderkey,
        |  round(o_totalprice, 2) *
        |    (CASE WHEN o_orderkey % 8 = 1 THEN 2 ELSE 1 END) AS amount,
        |  TRUE AS ren_ok
        |FROM orders WHERE o_orderkey % 8 IN (0, 1, 2)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val srcConn = new Connector(s, Scratch.dir("run"))
      val dstConn = new Connector(s, Scratch.dir("run"))
      val svc = new FlightService(srcConn, 0)
      try {
        val client = new FlightClient(s, "localhost", svc.boundPort)
        val state = graft.service.SyncState(Scratch.dir("run"))
        val url = s"grpc://localhost:${svc.boundPort}/orders_ren"
        val orders = T.orders(s, d).select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          concat(lit("n"), (col("o_orderkey") % 5).cast("string")).as("note"))
        srcConn.createTable("orders_ren",
          orders.filter(col("o_orderkey") % 8 === 0))
        val r1 = graft.service.Mirror.performSync(
          client, url, "orders_ren", dstConn, "orders_ren_dst", state)
        // rename tick: metadata-only on the source; the delta append
        // arrives under the NEW name and the replica must replay the
        // rename, not rebuild
        srcConn.loadTable("orders_ren").renameColumn("price", "amount")
        val sliceB = orders.filter(col("o_orderkey") % 8 === 1)
          .select(col("o_orderkey"), (col("price") * 2).as("amount"), col("note"))
        srcConn.insert("orders_ren", sliceB)
        val r2 = graft.service.Mirror.performSync(
          client, url, "orders_ren", dstConn, "orders_ren_dst", state)
        // drop tick: the source sheds `note`; the replica drops it too
        // and keeps streaming
        srcConn.loadTable("orders_ren").dropColumn("note")
        val sliceC = orders.filter(col("o_orderkey") % 8 === 2)
          .select(col("o_orderkey"), col("price").as("amount"))
        srcConn.insert("orders_ren", sliceC)
        val r3 = graft.service.Mirror.performSync(
          client, url, "orders_ren", dstConn, "orders_ren_dst", state)
        val witness = r1.status == "full_sync" &&
          r2.status == "incremental" && r2.rowsSynced == sliceB.count() &&
          r3.status == "incremental" && r3.rowsSynced == sliceC.count() &&
          dstConn.loadTable("orders_ren_dst").schema.fieldNames.toSeq ==
            Seq("o_orderkey", "amount")
        dstConn.query("orders_ren_dst")
          .withColumn("ren_ok", lit(witness))
          .orderBy("o_orderkey")
      } finally svc.close()
    })

  def queries: Seq[Q] = ql
}
