package graft.service

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Polling reader/writer client roles (reference: `run_reader`
  * `icerunner.py:716-736`, `run_writer` `:739-767`).
  *
  * `iterations = None` loops forever like the reference; tests and
  * `--iterations` bound it.
  */
object Clients {

  /** Poll-read loop: schema via `get_flight_info` (no scan), data via
    * `do_get`, log the count, sleep. */
  def runReader(spark: SparkSession, host: String, port: Int, table: String,
      intervalMs: Long = 1000L, iterations: Option[Int] = None): Long = {
    val client = new FlightClient(spark, host, port)
    var i = 0
    var last = 0L
    var continue = true
    while (continue) {
      try {
        val info = client.getFlightInfo(table)
        val fetched = client.doGet(table)
        try last = fetched.df.count()
        finally fetched.cleanup() // release any client-side spill chunks
        println(s"[reader] $table: $last rows " +
          s"(snapshot ${info.snapshotId}, ${info.schema.fields.length} cols)")
      } catch {
        case e: Exception => println(s"[reader] error: ${e.getMessage}")
      }
      i += 1
      continue = iterations.forall(i < _)
      if (continue) Thread.sleep(intervalMs)
    }
    last
  }

  /** Writer-tick schema: `{id: epoch-seconds, value: "val-NNN"}`
    * (reference: `icerunner.py:746-754`). The reference's default
    * pairing fails because this 2-col row cannot append into the 14-col
    * bootstrap table (SURVEY.md §2A-19); here `do_put` creates the
    * table with the writer's own schema on first put, so a fresh target
    * name just works. */
  val writerSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", StringType, nullable = false),
    StructField("written_at", TimestampType, nullable = false)))

  /** Poll-write loop: one row per tick via `do_put`. `batchRows` is the
    * reference's `-b/--batch-size` (`icerunner.py:1199-1205`): rows per
    * Arrow record batch on the wire. */
  def runWriter(spark: SparkSession, host: String, port: Int, table: String,
      intervalMs: Long = 1000L, iterations: Option[Int] = None,
      batchRows: Int = 4096): Long = {
    val client = new FlightClient(spark, host, port, batchRows)
    var i = 0
    var lastSnapshot = 0L
    var continue = true
    while (continue) {
      val nowMs = System.currentTimeMillis()
      val row = Row(nowMs / 1000L, f"val-${i % 1000}%03d", new Timestamp(nowMs))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), writerSchema)
      try {
        lastSnapshot = client.doPut(table, df)
        println(s"[writer] $table: appended 1 row (snapshot $lastSnapshot)")
      } catch {
        case e: Exception => println(s"[writer] error: ${e.getMessage}")
      }
      i += 1
      continue = iterations.forall(i < _)
      if (continue) Thread.sleep(intervalMs)
    }
    lastSnapshot
  }
}
