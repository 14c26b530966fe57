package graft

import java.nio.file.Files

import graft.warehouse.{Connector, GraftTable, SnapshotLog}
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshWarehouse(): String =
    Files.createTempDirectory("graft-wh-").toString

  test("create + read round-trip") {
    val c = new Connector(spark, freshWarehouse())
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(c.createTable("t1", df))
    assert(!c.createTable("t1", df), "create must be idempotent-false on existing")
    assert(c.count("t1") == 2)
    assert(c.query("t1").columns.toSeq == Seq("id", "v"))
    assert(c.tables == Seq("t1"))
  }

  test("append accumulates and bumps snapshot id") {
    val c = new Connector(spark, freshWarehouse())
    c.createTable("t", Seq((1L, "a")).toDF("id", "v"))
    assert(c.getCurrentSnapshotId("t").contains(1L))
    c.insert("t", Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
    assert(c.getCurrentSnapshotId("t").contains(2L))
    assert(c.count("t") == 3)
  }

  test("append rejects schema mismatch") {
    val c = new Connector(spark, freshWarehouse())
    c.createTable("t", Seq((1L, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      c.insert("t", Seq(("x", 1L)).toDF("v", "id")) // swapped types
    }
  }

  test("changes-since returns exactly the rows after the snapshot") {
    val c = new Connector(spark, freshWarehouse())
    c.createTable("t", Seq((1L, "a")).toDF("id", "v"))
    val s1 = c.getCurrentSnapshotId("t").get
    c.insert("t", Seq((2L, "b")).toDF("id", "v"))
    c.insert("t", Seq((3L, "c")).toDF("id", "v"))
    val changes = c.getChangesSinceSnapshot("t", s1).get
    assert(changes.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // no duplicates even across multiple intervening snapshots
    assert(changes.count() == 2)
    // since head → empty
    val head = c.getCurrentSnapshotId("t").get
    assert(c.getChangesSinceSnapshot("t", head).get.count() == 0)
  }

  test("time travel readAsOf") {
    val wh = freshWarehouse()
    val c = new Connector(spark, wh)
    c.createTable("t", Seq((1L, "a")).toDF("id", "v"))
    c.insert("t", Seq((2L, "b")).toDF("id", "v"))
    val t = c.loadTable("t")
    assert(t.read(asOf = Some(1L)).count() == 1)
    assert(t.read(asOf = Some(2L)).count() == 2)
    assert(t.read().count() == 2)
  }

  test("sql() sees warehouse tables through Catalyst") {
    val c = new Connector(spark, freshWarehouse())
    c.createTable("sales", Seq(("x", 10.0), ("y", 5.0), ("x", 2.5)).toDF("k", "amt"))
    val r = c.sql("SELECT k, sum(amt) AS total FROM sales GROUP BY k ORDER BY k")
      .as[(String, Double)].collect().toSeq
    assert(r == Seq(("x", 12.5), ("y", 5.0)))
  }

  test("property: N appends → count == sum of rows; incremental union == full read") {
    val c = new Connector(spark, freshWarehouse())
    val batches = (1 to 5).map(i => (1 to i).map(j => (i.toLong * 100 + j, s"b$i")).toDF("id", "v"))
    c.createTable("t", batches.head)
    batches.tail.foreach(b => c.insert("t", b))
    val total = batches.map(_.count()).sum
    assert(c.count("t") == total)
    // union of incremental reads over any snapshot cut == full read
    val t = c.loadTable("t")
    for (cut <- 0L to t.currentSnapshotId.get) {
      val upTo = if (cut == 0) 0L else t.read(asOf = Some(cut)).count()
      val after = t.changesSince(cut).count()
      assert(upTo + after == total, s"cut=$cut")
    }
  }

  test("clustered append records file stats; readWhere prunes files") {
    val c = new Connector(spark, freshWarehouse())
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("bucket", $"id" % 4)
      .withColumn("name", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("n"), $"id"))
    c.createTable("t", df.limit(1)) // establish schema
    val t = c.loadTable("t")
    t.append(df, clusterBy = Seq("id"), statsCols = Seq("name"),
      clusterParts = 8)
    val all = t.read()
    // range-clustered on id → a narrow id slice must hit fewer files
    val slice = t.readWhere("id", Some(100L), Some(200L))
    assert(slice.inputFiles.length < all.inputFiles.length,
      s"${slice.inputFiles.length} vs ${all.inputFiles.length}")
    // pruning is sound: pruned scan + row filter ≡ full scan + row filter
    val expected = all.filter($"id".between(100, 200)).count()
    assert(slice.filter($"id".between(100, 200)).count() === expected)
    // string stats prune too
    val sSlice = t.readWhere("name", Some("n100"), Some("n101"))
    assert(sSlice.filter($"name" === "n100").count() === 1)
    // stats survive the manifest round-trip
    val st = t.log.head.get.stats
    assert(st.nonEmpty && st.values.forall(f =>
      f.numMin.contains("id") && f.strMin.contains("name")))
  }

  test("compact rewrites files without changing content; expiry reclaims them") {
    val c = new Connector(spark, freshWarehouse())
    c.createTable("t", Seq((1L, "a")).toDF("id", "v"))
    (2L to 9L).foreach(i => c.insert("t", Seq((i, s"v$i")).toDF("id", "v")))
    val t = c.loadTable("t")
    val preCompactSnap = t.currentSnapshotId.get
    val preFiles = t.read().inputFiles.length
    assert(preFiles >= 9) // one tiny file per append

    val compactSnap = t.compact(targetFiles = 2)
    assert(t.read().inputFiles.length <= 2)
    assert(t.read().count() === 9)
    // time travel to before the compaction still sees the old files
    assert(t.read(asOf = Some(preCompactSnap)).count() === 9)
    // appends after compaction land on top of the baseline
    c.insert("t", Seq((10L, "v10")).toDF("id", "v"))
    assert(t.read().count() === 10)
    // changes-since skips the rewrite: only the real append is a change
    assert(t.changesSince(preCompactSnap).select("id").as[Long]
      .collect().toSeq === Seq(10L))

    // expiry up to the compaction baseline drops old manifests + files
    t.expireSnapshots(compactSnap.snapshotId)
    assert(t.log.snapshots.head.snapshotId === compactSnap.snapshotId)
    assert(t.read().count() === 10) // head view intact
    intercept[IllegalArgumentException] {
      t.expireSnapshots(compactSnap.snapshotId + 1)
    }
    // changes-since across the expired horizon must FAIL, not silently
    // return a partial delta (a lagging replica would diverge)
    intercept[IllegalStateException] { t.changesSince(1L) }
    // ...but the delta from the surviving baseline still works
    assert(t.changesSince(compactSnap.snapshotId - 1).count() === 1)
  }

  test("additive schema evolution: old files read as nulls, time travel keeps the old schema") {
    import org.apache.spark.sql.types._
    val c = new Connector(spark, freshWarehouse())
    c.createTable("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val t = c.loadTable("t")
    val preEvolve = t.currentSnapshotId.get
    t.addColumns(StructType(Seq(StructField("score", DoubleType, nullable = true))))
    // head read: evolved schema, old rows null-filled
    assert(t.read().columns.toSeq === Seq("id", "v", "score"))
    assert(t.read().filter($"score".isNull).count() === 2)
    // appends must carry the evolved schema; old shape is rejected
    intercept[IllegalArgumentException] {
      t.append(Seq((3L, "c")).toDF("id", "v"))
    }
    t.append(Seq((3L, "c", 0.5)).toDF("id", "v", "score"))
    assert(t.read().filter($"score".isNotNull).count() === 1)
    // time travel to before the evolution sees the old schema
    assert(t.read(asOf = Some(preEvolve)).columns.toSeq === Seq("id", "v"))
    // guards: non-nullable and duplicate columns rejected
    intercept[IllegalArgumentException] {
      t.addColumns(StructType(Seq(StructField("x", LongType, nullable = false))))
    }
    intercept[IllegalArgumentException] {
      t.addColumns(StructType(Seq(StructField("id", LongType, nullable = true))))
    }
  }

  test("snapshot log json round-trip incl. escapes") {
    val dir = Files.createTempDirectory("graft-log-")
    val log = new SnapshotLog(dir)
    val s = log.commit("create", Seq("data/s1/part-0.parquet"),
      """{"type":"struct","fields":[]}""")
    assert(s.snapshotId == 1L)
    val s2 = log.commit("append", Seq("data/s2/a.parquet", "data/s2/b.parquet"), s.schemaJson)
    assert(s2.snapshotId == 2L)
    assert(log.snapshots.map(_.snapshotId) == Seq(1L, 2L))
    assert(log.changedFiles(1L).size == 2)
    assert(log.dataFiles().size == 3)
  }
}
