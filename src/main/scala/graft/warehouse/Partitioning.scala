package graft.warehouse

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg-style HIDDEN PARTITIONING for [[GraftTable]].
  *
  * The reference's Iceberg tables are unpartitioned (PyIceberg's
  * default spec, `icerunner.py:133-161`), so this is parity-plus: the
  * capability that makes point lookups and time-range scans on a
  * 100 TB table read a sliver of the file set *without* the user ever
  * writing the partition column into a query. A partition field is a
  * TRANSFORM over a source column — `bucket(n)`, `truncate(w)`,
  * `day`, `identity` — declared once on the table; writers lay files
  * out one-partition-value-per-file, readers map query predicates
  * through the transform and prune files from manifest metadata alone.
  *
  * Design (Spark-first):
  *   - Writes derive the partition value with codegen'd Catalyst
  *     expressions ([[PartitionField.expr]]) and hand layout to
  *     `DataFrameWriter.partitionBy`, so each data file covers exactly
  *     ONE partition value and the derived column is *not* stored in
  *     the data (it is recoverable from the source column — Iceberg's
  *     hidden-partitioning contract).
  *   - The per-file partition value is recorded in the existing
  *     manifest [[FileStat]] maps under a spec-versioned synthetic
  *     stat name ([[PartitionField.statName]], e.g.
  *     `p_b16_o_custkey`), with min == max. Pruning then reuses
  *     [[FileStat.mayContain]] unchanged.
  *   - SPEC EVOLUTION is era-correct by construction: files written
  *     under `bucket(8)` carry `p_b8_…` entries, later files under
  *     `bucket(16)` carry `p_b16_…`; a lookup maps its value through
  *     EVERY transform in the spec history and a file is pruned by
  *     whichever entry it has (missing entries conservatively match —
  *     the same unknown-column rule every stats path already obeys).
  *     No rewrite is needed to change the spec, exactly like Iceberg.
  *   - Bucket pruning applies to equality/IN probes only; `day`,
  *     `truncate`, and `identity` are MONOTONE, so range bounds map
  *     through them ([[PartitionField.monotone]]).
  *
  * Driver-side transform evaluation must be bit-identical to the
  * engine's: `bucket` evaluates the SAME Catalyst `Murmur3Hash`
  * expression (seed 42, `functions.hash`) on a literal, rather than
  * reimplementing the hash (parity is pinned in WarehouseSpec).
  */
final case class PartitionField(kind: String, column: String, param: Int = 0) {
  require(PartitionField.kinds(kind), s"unknown partition transform '$kind'")
  require(kind != "bucket" || param > 1, s"bucket needs param > 1, got $param")
  require(kind != "truncate" || param > 0, s"truncate needs param > 0")

  /** SQL-text rendering of the transform — the ONE spelling shared by
    * SHOW CREATE TABLE's `PARTITIONED BY` clause and SHOW PARTITIONS'
    * tuple labels, parseable back by the CREATE routes
    * (`GraftSqlBridge.decodeTransform`). `quote` wraps the column for
    * contexts that backtick identifiers. */
  def sqlText(quote: String => String = identity): String = kind match {
    case "identity" => quote(column)
    case "bucket"   => s"bucket($param, ${quote(column)})"
    case "truncate" => s"truncate($param, ${quote(column)})"
    case k          => s"${k}s(${quote(column)})"
  }

  /** Spec-versioned manifest stat key — the transform AND its param are
    * encoded so two eras of the same column never share an entry. */
  def statName: String = kind match {
    case "identity" => s"p_id_$column"
    case "bucket"   => s"p_b${param}_$column"
    case "truncate" => s"p_t${param}_$column"
    case "day"      => s"p_day_$column"
    case "month"    => s"p_month_$column"
    case "year"     => s"p_year_$column"
    case "hour"     => s"p_hour_$column"
  }

  /** Engine-side derivation of the partition value (codegen'd built-ins
    * only — this sits in every partitioned write's hot path). */
  def expr(dt: DataType): Column = kind match {
    case "identity" => col(column)
    case "bucket"   => pmod(hash(col(column)), lit(param))
    case "truncate" => dt match {
      case StringType => substring(col(column), 1, param)
      case _          => col(column) - pmod(col(column), lit(param.toLong))
    }
    // session TZ is UTC (build.sbt), so the cast is the UTC epoch-day
    case "day" => datediff(col(column).cast(DateType), lit("1970-01-01").cast(DateType))
    // Iceberg's temporal-transform encodings: months/years since
    // 1970-01 / 1970 (negative before the epoch — 1969-12 is month −1,
    // our formula (y−1970)·12 + m−1 = −12 + 11 = −1 matches), hours
    // as floor(epoch-seconds / 3600) — all calendar math proleptic
    // Gregorian, same as the driver-side java.time twin.
    case "month" =>
      val d = col(column).cast(DateType)
      ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast(IntegerType)
    case "year" => (year(col(column).cast(DateType)) - lit(1970)).cast(IntegerType)
    case "hour" =>
      // NTZ casts to TimestampType at the UTC session TZ first;
      // unix_timestamp floors to epoch seconds, floor handles pre-1970
      floor(unix_timestamp(col(column).cast(TimestampType)) / lit(3600))
        .cast(IntegerType)
  }

  /** True when the transform preserves order, i.e. range bounds may be
    * mapped through it; `bucket` scrambles and only maps points. */
  def monotone: Boolean = kind != "bucket"

  /** Whether the parsed partition-directory value is numeric for a
    * source column of type `dt` (decides which FileStat map records
    * it; a string that merely looks numeric must NOT become a numeric
    * stat or bound-type checks would throw on probe). */
  def numericValue(dt: DataType): Boolean = kind match {
    case "bucket" | "day" | "month" | "year" | "hour" => true
    case "identity" | "truncate" => dt match {
      case _: NumericType => true
      case _ => false
    }
  }

  /** Supported for stats recording? (identity over temporal columns
    * writes locale-fragile directory names — skipped, conservative.) */
  def recordable(dt: DataType): Boolean = kind match {
    case "bucket" => PartitionField.bucketable(dt)
    case "day" | "month" | "year" => dt match {
      case DateType | TimestampType | TimestampNTZType => true; case _ => false
    }
    // a date has no hour — Iceberg scopes hour() to timestamps too
    case "hour" => dt match {
      case TimestampType | TimestampNTZType => true; case _ => false
    }
    case "truncate" => dt match {
      case StringType | LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    case "identity" => dt match {
      case _: NumericType | StringType => true; case _ => false
    }
  }

  /** DRIVER-side transform of a query value — must equal the engine's
    * [[expr]] on the same input (spec-pinned). Used to map predicate
    * bounds/points into partition space for manifest pruning. */
  def apply(v: Any, dt: DataType): Any = kind match {
    case "identity" => v
    case "bucket"   => PartitionField.bucket(v, dt, param)
    case "truncate" => dt match {
      case StringType =>
        val s = v.toString; if (s.length > param) s.substring(0, param) else s
      case _ =>
        // ANSI-consistent with the engine's `col - pmod(col, w)`:
        // values within w of Long.MinValue cannot be truncated (the
        // floor multiple is unrepresentable) — subtractExact throws,
        // and partitionProbes' Try() skips the probe (conservative),
        // exactly as the engine-side write would have refused the row
        val l = v.asInstanceOf[Number].longValue
        java.lang.Math.subtractExact(l, java.lang.Math.floorMod(l, param.toLong))
    }
    case "day"   => PartitionField.epochDay(v)
    case "month" => PartitionField.epochMonth(v)
    case "year"  => PartitionField.epochYear(v)
    case "hour"  => PartitionField.epochHour(v)
  }
}

object PartitionField {
  val kinds: Set[String] =
    Set("identity", "bucket", "truncate", "day", "month", "year", "hour")

  private[warehouse] def bucketable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  /** floorMod(murmur3_hash(v), n) via the SAME Catalyst expression the
    * engine evaluates (`functions.hash` = Murmur3, seed 42), on a
    * literal normalized to the column's exact type — hashing an Int as
    * a Long would silently change every bucket. */
  private[warehouse] def bucket(v: Any, dt: DataType, n: Int): Int = {
    val norm: Any = dt match {
      case LongType    => v.asInstanceOf[Number].longValue
      case IntegerType => v.asInstanceOf[Number].intValue
      case ShortType   => v.asInstanceOf[Number].shortValue
      case ByteType    => v.asInstanceOf[Number].byteValue
      case StringType  => v.toString
      case other => throw new IllegalArgumentException(
        s"bucket transform unsupported for column type $other")
    }
    val h = new Murmur3Hash(Seq(Literal.create(norm, dt))).eval(null)
      .asInstanceOf[Int]
    java.lang.Math.floorMod(h, n)
  }

  /** UTC epoch-day of a driver-side temporal value (engine: cast to
    * DateType under the UTC session TZ, then datediff from 1970-01-01). */
  private[warehouse] def epochDay(v: Any): Int = (v match {
    case t: java.sql.Timestamp =>
      java.lang.Math.floorDiv(t.getTime, 86400000L)
    case t: java.time.LocalDateTime => t.toLocalDate.toEpochDay
    case t: java.time.Instant =>
      java.lang.Math.floorDiv(t.toEpochMilli, 86400000L)
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
    case other => throw new IllegalArgumentException(
      s"day transform needs a temporal value, got ${other.getClass.getName}")
  }).toInt

  /** The UTC calendar date of a driver-side temporal value — proleptic
    * Gregorian (java.time), matching Spark's datetime semantics. */
  private def utcDate(v: Any): java.time.LocalDate = v match {
    case t: java.sql.Timestamp =>
      java.time.LocalDate.ofEpochDay(java.lang.Math.floorDiv(t.getTime, 86400000L))
    case t: java.time.LocalDateTime => t.toLocalDate
    case t: java.time.Instant =>
      java.time.LocalDate.ofEpochDay(
        java.lang.Math.floorDiv(t.toEpochMilli, 86400000L))
    case d: java.sql.Date => d.toLocalDate
    case d: java.time.LocalDate => d
    case other => throw new IllegalArgumentException(
      s"temporal transform needs a temporal value, got ${other.getClass.getName}")
  }

  /** Months since 1970-01 (Iceberg's month encoding; 1969-12 is −1). */
  private[warehouse] def epochMonth(v: Any): Int = {
    val d = utcDate(v)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** Years since 1970 (Iceberg's year encoding; 1969 is −1). */
  private[warehouse] def epochYear(v: Any): Int = utcDate(v).getYear - 1970

  /** Hours since the epoch, floored (timestamps only — a date has no
    * hour, [[PartitionField.recordable]] scopes it out). */
  private[warehouse] def epochHour(v: Any): Int = (v match {
    case t: java.sql.Timestamp =>
      java.lang.Math.floorDiv(t.getTime, 3600000L)
    case t: java.time.LocalDateTime =>
      java.lang.Math.floorDiv(
        t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli, 3600000L)
    case t: java.time.Instant =>
      java.lang.Math.floorDiv(t.toEpochMilli, 3600000L)
    case other => throw new IllegalArgumentException(
      s"hour transform needs a timestamp value, got ${other.getClass.getName}")
  }).toInt
}

private[warehouse] object Partitioning {

  /** Render a NUMERIC manifest stat value for display (partition
    * listings): integral doubles print without the trailing `.0` so
    * an INT partition value reads as `1995`, not `1995.0`. Shared by
    * `$partitions` and SHOW PARTITIONS — the two must never drift. */
  def fmtStatValue(v: Double): String =
    if (v == math.floor(v) && math.abs(v) < (1L << 53).toDouble)
      v.toLong.toString
    else v.toString

  /** Serialize one spec as a line: `kind:param:column` fields joined
    * by `,` (column names can't contain `,`/`:`/newlines — enforced on
    * set). An empty line is the empty spec (partitioning cleared). */
  def specLine(fields: Seq[PartitionField]): String = {
    fields.foreach { f =>
      require(!f.column.exists(c => c == ',' || c == ':' || c == '\n'),
        s"unsupported character in partition column name '${f.column}'")
    }
    fields.map(f => s"${f.kind}:${f.param}:${f.column}").mkString(",")
  }

  def parseSpecLine(line: String): Seq[PartitionField] =
    if (line.trim.isEmpty) Nil
    else line.split(",").toSeq.map { part =>
      val Array(kind, param, columnParts @ _*) = part.split(":").toSeq.toArray
      PartitionField(kind, columnParts.mkString(":"), param.toInt)
    }

  /** Un-escape a Spark partition-directory value (`%xx` sequences, the
    * subset of ExternalCatalogUtils.escapePathName our supported value
    * types produce). */
  def unescapePathValue(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 3 <= s.length) {
        try {
          sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
          i += 3
        } catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse the partition values encoded in a file's commit-relative
    * path (`…/p_b8_o_custkey=3/part-….parquet`) into FileStat entries,
    * guided by the spec history (which decides numeric vs string).
    * Null partitions (`__HIVE_DEFAULT_PARTITION__`) and unknown dir
    * names record nothing — the file conservatively matches probes. */
  def pathStatEntries(relPath: String, history: Seq[PartitionField],
      dtOf: String => Option[DataType])
      : (Map[String, Double], Map[String, String]) = {
    var num = Map.empty[String, Double]
    var str = Map.empty[String, String]
    relPath.split('/').dropRight(1).foreach { seg =>
      val eq = seg.indexOf('=')
      if (eq > 0) {
        val name = seg.substring(0, eq)
        val raw = unescapePathValue(seg.substring(eq + 1))
        if (raw != "__HIVE_DEFAULT_PARTITION__") {
          history.find(_.statName == name).foreach { f =>
            dtOf(f.column).filter(f.recordable).foreach { dt =>
              if (f.numericValue(dt)) {
                // partition values of numeric transforms are integral
                try { val d = raw.toDouble; num += name -> d }
                catch { case _: NumberFormatException => () }
              } else str += name -> raw
            }
          }
        }
      }
    }
    (num, str)
  }
}
