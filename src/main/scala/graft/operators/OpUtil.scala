package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Shared predicates for adaptive physical-strategy choices. */
private[operators] object OpUtil {
  /** Ids the block-broadcast scorers can key on (cast-to-long safe). */
  def isIntegralId(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Bucket-skew guard for LSH candidate streams: drop rows in any
    * bucket larger than `cap` BEFORE the candidate self/equi-join, so a
    * degenerate corpus (many identical / near-zero vectors collapsing
    * into one (band, bucket)) bounds the join at cap² pairs per bucket
    * instead of going quadratic in the corpus.
    *
    * Dropping a mega-bucket costs recall only on that bucket's members —
    * candidates the downstream exact verify would either reject en masse
    * (hash collisions of dissimilar rows) or that other bands still
    * cover. The drop is LOUD: every dropped row bumps a named
    * accumulator (visible in the Spark UI and to specs) — silence never
    * masquerades as coverage.
    *
    * Physical shape (round 6, replacing the r5 count-window): bucket
    * populations come from a groupBy — map-side partial aggregation, so
    * only per-partition (key, count) rows shuffle, not the stream — and
    * the (usually empty) overflow set anti-joins back by BROADCAST. The
    * big banded stream is never shuffled or sorted by the guard; it is
    * scanned twice, which for an LSH stream is a narrow re-map of the
    * source. The r5 window formulation shuffled the whole stream and
    * cost q32 +38% for a guard that almost never fires; skew itself
    * bounds the broadcast (hot buckets number ≤ |stream|/cap, and a
    * corpus degenerate enough to overflow that is concentrated, not
    * spread). */
  def capBuckets(df: DataFrame, keys: Seq[String], cap: Int,
      metricName: String): DataFrame = {
    require(cap > 0, "bucket cap must be positive")
    val acc = df.sparkSession.sparkContext.longAccumulator(metricName)
    // at-least-once on broadcast rebuild/retry — fine for a skew alarm
    val mark = udf { (n: Long) => { acc.add(n); n } }
      .asNondeterministic() // side-effecting: Catalyst must not clone/reorder it
    // hot side carries RENAMED keys: the anti-join is a self-join of the
    // banded stream's lineage, and plan-qualified references would be
    // ambiguous
    val hot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bc"))
      .filter(col("__bc") > cap)
      .select(keys.map(k => col(k).as(s"__hot_$k")) :+
        mark(col("__bc")).as("__bc"): _*)
      .drop("__bc")
    // null-safe equality so an (unlikely) NULL-keyed mega-bucket is still
    // guarded — matches the window formulation's partition semantics
    val cond = keys.map(k => col(k) <=> col(s"__hot_$k")).reduce(_ && _)
    df.join(broadcast(hot), cond, "left_anti")
  }
}
