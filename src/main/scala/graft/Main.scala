package graft

import org.apache.spark.sql.SparkSession

import graft.warehouse.Connector

/** CLI entry point (reference: `main()`, `icerunner.py:1158-1239`).
  *
  * Subcommands grow with the build: `demo` exercises the warehouse
  * end-to-end; `serve|read|write|mirror` arrive with the service layer.
  */
object Main {

  def session(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "demo" :: whPath :: Nil => demo(whPath)
    case other =>
      System.err.println(
        s"""usage: graft.Main <command>
           |  demo <warehouseDir>   create/append/query/changes round-trip
           |(got: ${other.mkString(" ")})""".stripMargin)
      sys.exit(2)
  }

  /** End-to-end warehouse round-trip, printing each step's observable
    * result. Doubles as the smoke demo the reference's README loop is. */
  private def demo(whPath: String): Unit = {
    val spark = session("graft-demo")
    import spark.implicits._
    val c = new Connector(spark, whPath)

    println(s"[demo] warehouse=$whPath")
    val created = c.createTable("events",
      Seq((1L, "click"), (2L, "view")).toDF("id", "etype"))
    println(s"[demo] create events -> $created")
    println(s"[demo] re-create events -> ${c.createTable("events", Seq((9L, "x")).toDF("id", "etype"))}")
    val s1 = c.getCurrentSnapshotId("events")
    println(s"[demo] snapshot after create -> $s1")
    c.insert("events", Seq((3L, "purchase"), (4L, "click")).toDF("id", "etype"))
    println(s"[demo] count after append -> ${c.count("events")}")
    val agg = c.sql(
      "SELECT etype, count(*) AS n FROM events GROUP BY etype ORDER BY etype")
      .collect().map(r => s"${r.get(0)}=${r.get(1)}").mkString(", ")
    println(s"[demo] sql group-by -> $agg")
    val changes = c.getChangesSinceSnapshot("events", s1.get).get
      .select("id").as[Long].collect().sorted.mkString(",")
    println(s"[demo] changes since snapshot ${s1.get} -> ids [$changes]")
    println(s"[demo] time-travel count asOf=1 -> ${c.loadTable("events").read(Some(1L)).count()}")
    println(s"[demo] tables -> ${c.tables.mkString(", ")}")
    try c.insert("events", Seq(("bad", 1L)).toDF("etype", "id"))
    catch { case e: IllegalArgumentException =>
      println(s"[demo] schema-mismatch append rejected: ${e.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
