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
    * The bucket-count window partitions on the same keys the candidate
    * join shuffles on, so the exchange is shared — the guard adds a
    * partition-local sort, not a shuffle.
    */
  def capBuckets(df: DataFrame, keys: Seq[String], cap: Int,
      metricName: String): DataFrame = {
    require(cap > 0, "bucket cap must be positive")
    val acc = df.sparkSession.sparkContext.longAccumulator(metricName)
    val keep = udf { (n: Long) =>
      // at-least-once on task retries — fine for a skew alarm
      if (n > cap) { acc.add(1L); false } else true
    }.asNondeterministic() // side-effecting: Catalyst must not clone/reorder it
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__bc", count(lit(1)).over(w))
      .filter(keep(col("__bc")))
      .drop("__bc")
  }
}
