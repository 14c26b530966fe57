package graft.warehouse

import java.nio.file.{Files, Path}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** A warehouse table: parquet data files + snapshot log.
  *
  * Capability-equivalent to the reference's Iceberg table usage
  * (`icerunner.py:133-178`: create + transactional append; `:209-259`:
  * snapshot ids + changes-since) rebuilt Spark-first — reads resolve a
  * file list from the log and hand it to Spark's vectorized parquet
  * reader, so filter pushdown / column pruning / partition coalescing
  * all apply as usual.
  *
  * Layout: `<dir>/data/s<commitUuid>/part-*.parquet` — each commit owns
  * a subdirectory, so data files are immutable and never renamed.
  */
final class GraftTable private (
    val name: String,
    val dir: Path,
    spark: SparkSession) {

  val log = new SnapshotLog(dir)

  def schema: StructType =
    log.head.map(s => DataType.fromJson(s.schemaJson).asInstanceOf[StructType])
      .getOrElse(throw new IllegalStateException(s"table $name has no snapshots"))

  def currentSnapshotId: Option[Long] = log.currentSnapshotId

  /** Read the table head (or a past snapshot). Empty-but-created tables
    * read as an empty DataFrame with the committed schema. */
  def read(asOf: Option[Long] = None): DataFrame = {
    val files = log.dataFiles(asOf)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(files: _*)
  }

  /** Rows appended by snapshots in `(sinceId, head]` — incremental read
    * without any join (fixes `icerunner.py:243-252`, SURVEY.md §2A-12). */
  def changesSince(sinceId: Long): DataFrame = {
    val files = log.changedFiles(sinceId)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(files: _*)
  }

  /** Transactional append: write data files first, commit the manifest
    * last (see SnapshotLog commit protocol). Insert-only, matching the
    * reference (no update/delete path exists there either). */
  def append(df: DataFrame): Snapshot = {
    val existing = log.head
    existing.foreach { h =>
      val expected = DataType.fromJson(h.schemaJson).asInstanceOf[StructType]
      require(compatible(expected, df.schema),
        s"append schema mismatch for $name:\n expected $expected\n got ${df.schema}")
    }
    val commitDir = dir.resolve("data").resolve(s"s${UUID.randomUUID().toString.take(12)}")
    df.write.parquet(commitDir.toString)
    val files = Files.list(commitDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => dir.relativize(p).toString)
      .toSeq.sorted
    val schemaJson = existing.map(_.schemaJson).getOrElse(df.schema.json)
    log.commit(if (existing.isEmpty) "create" else "append", files, schemaJson)
  }

  private def compatible(expected: StructType, got: StructType): Boolean =
    expected.fields.map(f => (f.name, f.dataType)).sameElements(
      got.fields.map(f => (f.name, f.dataType)))
}

object GraftTable {
  /** Create a new table from initial data. Idempotency matches the
    * reference's create_table (`icerunner.py:133-161`): returns None if
    * the table already exists. */
  def create(spark: SparkSession, dir: Path, name: String, data: DataFrame): Option[GraftTable] = {
    val t = new GraftTable(name, dir, spark)
    if (t.log.exists && t.log.head.nonEmpty) None
    else {
      Files.createDirectories(dir)
      t.log.init()
      t.append(data)
      Some(t)
    }
  }

  def load(spark: SparkSession, dir: Path, name: String): Option[GraftTable] = {
    val t = new GraftTable(name, dir, spark)
    if (t.log.exists && t.log.head.nonEmpty) Some(t) else None
  }
}
