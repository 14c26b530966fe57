package graft.warehouse

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One persistent SQL VIEW definition (r18).
  *
  * The reference's `sql()` pass-through (`icerunner.py:200-207`) hands
  * users DuckDB's session views for free; this surface persists them
  * as first-class warehouse artifacts instead: the view's SQL TEXT
  * plus a creation-time schema fingerprint live under
  * `<warehouse>/default/_views/<name>.properties`, so a NEW Connector
  * on the same warehouse serves the same views (the reference's
  * session views die with the process).
  *
  * Semantics are deliberately LATE-BOUND SQL macro + schema pin:
  *  - the TEXT re-plans against the live tables on every query (a view
  *    over `t` sees t's commits immediately — no staleness, nothing to
  *    refresh, zero storage beyond the text);
  *  - the recorded schema pins the view's OUTPUT (Spark's default
  *    SCHEMA COMPENSATION): columns project BY NAME and cast back to
  *    their creation-time types, so `SELECT *` views keep their
  *    declared shape when the underlying table gains columns or widens
  *    types, and a column the view depended on going missing refuses
  *    with a drift message naming the view — never a silently
  *    different shape. `WITH SCHEMA EVOLUTION` opts out and adopts the
  *    live shape; `WITH SCHEMA TYPE EVOLUTION` pins names but adopts
  *    live types.
  *
  * @param cols user column list of `CREATE VIEW v (a, b) AS …`,
  *   re-applied before compensation on every read
  * @param mode `compensation` | `typeevolution` | `evolution`
  */
final case class ViewDef(
    name: String,
    sql: String,
    cols: Option[Seq[String]],
    schemaJson: String,
    mode: String,
    comment: Option[String],
    createdMs: Long)

/** Disk codec for [[ViewDef]]s: one `java.util.Properties` file per
  * view (robust text escaping for multi-line SQL), written
  * tmp-then-atomic-move so readers never observe a torn definition. */
object ViewStore {
  /** View names CANONICALIZE to lowercase (r19): Spark SQL identifier
    * resolution is case-insensitive, so `CREATE VIEW V_Big` and
    * `SELECT … FROM v_big` must denote ONE entity — storing the
    * spelled case made lookups case-sensitive while every other
    * resolution path (temp views, CTE shadowing) was not. */
  def canon(name: String): String = name.toLowerCase

  private def file(viewsDir: Path, name: String): Path =
    viewsDir.resolve(canon(name) + ".properties")

  /** View NAMES share the table identifier rules (they live in the
    * same SQL namespace); a name that is also a path would escape the
    * store directory. */
  def requireValidName(name: String): Unit =
    require(name.nonEmpty && !name.contains('$') && !name.contains('/') &&
        !name.contains(java.io.File.separator) && !name.contains("..") &&
        !name.contains(' '),
      s"invalid view name '$name'")

  def exists(viewsDir: Path, name: String): Boolean =
    !name.contains('/') && !name.contains("..") &&
      Files.isRegularFile(file(viewsDir, name))

  /** Atomic rename of a stored definition: ONE filesystem move (the
    * save-new-then-delete-old sequence a crash could tear in half,
    * leaving the view live under both names). */
  def rename(viewsDir: Path, from: String, to: String): Unit = {
    requireValidName(from); requireValidName(to)
    try Files.move(file(viewsDir, from), file(viewsDir, to),
      StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(file(viewsDir, from), file(viewsDir, to))
    }
  }

  def list(viewsDir: Path): Seq[String] = {
    if (!Files.isDirectory(viewsDir)) return Seq.empty
    val ls = Files.list(viewsDir)
    try ls.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".properties"))
      .map(_.stripSuffix(".properties")).toSeq.sorted
    finally ls.close()
  }

  def save(viewsDir: Path, vd: ViewDef): Unit = {
    requireValidName(vd.name)
    Files.createDirectories(viewsDir)
    val p = new java.util.Properties()
    p.setProperty("sql", vd.sql)
    p.setProperty("schema", vd.schemaJson)
    p.setProperty("mode", vd.mode)
    p.setProperty("created_ms", vd.createdMs.toString)
    vd.comment.foreach(p.setProperty("comment", _))
    vd.cols.foreach { cs =>
      p.setProperty("col.count", cs.size.toString)
      cs.zipWithIndex.foreach { case (c, i) => p.setProperty(s"col.$i", c) }
    }
    val tmp = viewsDir.resolve(s".${canon(vd.name)}.${
      java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, "graft view definition") finally out.close()
    try Files.move(tmp, file(viewsDir, vd.name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, file(viewsDir, vd.name),
          StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def load(viewsDir: Path, name: String): ViewDef = {
    requireValidName(name)
    val p = new java.util.Properties()
    val in = Files.newInputStream(file(viewsDir, name))
    try p.load(in) finally in.close()
    val sql = Option(p.getProperty("sql")).getOrElse(
      throw new IllegalStateException(s"view $name: corrupt definition " +
        s"(no sql) at ${file(viewsDir, name)}"))
    val cols = Option(p.getProperty("col.count")).map { n =>
      (0 until n.toInt).map(i => p.getProperty(s"col.$i"))
    }
    ViewDef(canon(name), sql, cols,
      Option(p.getProperty("schema")).getOrElse(""),
      Option(p.getProperty("mode")).getOrElse("compensation"),
      Option(p.getProperty("comment")),
      Option(p.getProperty("created_ms")).map(_.toLong).getOrElse(0L))
  }

  def delete(viewsDir: Path, name: String): Boolean = {
    requireValidName(name)
    Files.deleteIfExists(file(viewsDir, name))
  }
}
