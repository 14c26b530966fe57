package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional file
  * skipping: lay a table out so each data file covers a small
  * hyper-rectangle in two (or three) dimensions at once, making
  * [[GraftTable.readWhereAll]] prune files for range predicates on
  * either column — or both, multiplicatively — from ONE table copy.
  * Single-column range clustering (append's `clusterBy`) gives perfect
  * skipping on one column and none on any other; Z-order trades a
  * little of the first for usable skipping on both. The reference has
  * no layout control at all (its appends land row-batches as-is).
  *
  * Scale shape: one 4-value min/max aggregate (driver-side O(1)) to
  * learn the normalization bounds, then a single range-exchange on the
  * interleaved key — the same one shuffle a plain clustered write pays.
  * The Z-value itself is pure Catalyst bit arithmetic (shift/and/or),
  * codegen'd, never a UDF.
  *
  * Normalization matters: interleaving RAW values lets the wider
  * column's high bits dominate the curve (a 2^16-range column next to
  * a 2^11-range one degenerates to ordering by the wide column alone),
  * so both columns are first rank-scaled to 16 bits. TWO rank
  * functions are offered, same curve downstream:
  *
  *  - [[cluster]]: linear min/max scaling — exact and cheapest (one
  *    4-value aggregate), correct when key mass is roughly uniform
  *    (the TPC-H-ish key columns);
  *  - [[clusterQuantile]]: equal-MASS percentile buckets — the rank of
  *    a value is its quantile bucket, learned from one
  *    `approxQuantile` sketch pass. Required for heavily skewed
  *    columns (power-law user ids, document lengths): under linear
  *    scaling 99% of the mass can collapse onto a handful of rank
  *    values, every file then spans the full dense region in that
  *    dimension, and min/max stats prune nothing (the degeneration
  *    WarehouseSpec pins); quantile ranks give every file a narrow
  *    equal-mass slice, restoring file skipping.
  */
object ZOrder {

  /** Interleave one zero bit between the low 16 bits (Morton spread),
    * via the standard mask-doubling ladder — five shift/and/or steps,
    * all Catalyst built-ins. */
  private def spread16(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 32-bit Z-value of two 16-bit ranks (a in even bits, b in odd). */
  private[graft] def zvalue(rankA: Column, rankB: Column): Column =
    spread16(rankA).bitwiseOR(shiftleft(spread16(rankB), 1))

  /** Interleave TWO zero bits between the low 21 bits (3-D Morton
    * spread) — the standard 64-bit three-way mask ladder. */
  private def spread21(c: Column): Column = {
    var x = c.bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x1249249249249249L))
    x
  }

  /** 63-bit Z-value of three 21-bit ranks. */
  private[graft] def zvalue3(rankA: Column, rankB: Column,
      rankC: Column): Column =
    spread21(rankA)
      .bitwiseOR(shiftleft(spread21(rankB), 1))
      .bitwiseOR(shiftleft(spread21(rankC), 2))

  /** Linear b-bit rank of a numeric column over [lo, hi]. */
  private def rank(c: Column, lo: Double, hi: Double, bits: Int): Column =
    if (hi > lo)
      ((c.cast("double") - lit(lo)) / lit(hi - lo)
        * lit(((1L << bits) - 1).toDouble)).cast("long")
    else lit(0L)

  /** Re-lay `df` along the Z-curve of two numeric columns. Append the
    * result with per-column stats and both columns prune:
    * {{{
    * table.append(ZOrder.cluster(df, "a", "b", parts = 16),
    *              statsCols = Seq("a", "b"))
    * }}}
    * The Z key is computed, range-partitioned on, sorted within
    * partitions (row-group-level locality inside each file), and
    * DROPPED — the stored schema is untouched.
    *
    * @param parts file granularity: number of Z-ranges (≈ data files);
    *              more files = finer skipping, smaller row groups */
  def cluster(df: DataFrame, colA: String, colB: String,
      parts: Int): DataFrame = cluster(df, Seq(colA, colB), parts)

  /** General form: 2 or 3 numeric columns (16- / 21-bit ranks). */
  def cluster(df: DataFrame, cols: Seq[String], parts: Int): DataFrame = {
    require(parts > 0, "parts must be positive")
    require(cols.size == 2 || cols.size == 3,
      s"Z-order supports 2 or 3 columns, got ${cols.size}")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.foreach(i => require(!b.isNullAt(2 * i),
      s"Z-order needs non-null bounds for ${cols(i)}"))
    val bits = if (cols.size == 2) 16 else 21
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      rank(col(c), b.getDouble(2 * i), b.getDouble(2 * i + 1), bits)
    }
    val z = if (cols.size == 2) zvalue(ranks(0), ranks(1))
      else zvalue3(ranks(0), ranks(1), ranks(2))
    val tmp = "__graft_zvalue"
    df.withColumn(tmp, z)
      .repartitionByRange(parts, col(tmp))
      .sortWithinPartitions(tmp)
      .drop(tmp)
  }

  /** Quantile-bucket b-bit rank: `thr` is the (deduped, ascending)
    * quantile-threshold ladder; a value's bucket is the count of
    * thresholds ≤ it, scaled to the full b-bit space so both
    * dimensions' bits carry equal curve significance regardless of how
    * many distinct thresholds each column produced. r21: the count is
    * the NATIVE binary-search expression
    * [[graft.functions.LadderCount]] — the previous higher-order
    * `filter` over a ≤255-literal array evaluated interpreted per row
    * and was q110's hottest stage twice over (identical counts by
    * construction, see the expression's scaladoc); NULLs rank 0 (the
    * curve's origin, matching range-partitioning's nulls-first). */
  private def quantRank(c: Column, thr: Seq[Double], bits: Int): Column = {
    val cnt = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.LadderCount(
        org.apache.spark.sql.GraftColumnBridge.expression(c.cast("double")),
        thr.toArray))
    val m = thr.size.toLong // cnt ∈ [0, m]
    // scale as (cnt * maxRank) / m — dividing maxRank by m FIRST and
    // multiplying after would truncate low and then overshoot past the
    // bit mask at cnt = m (e.g. 99 * (65535/99) = 65538 > 0xFFFF)
    // Column./ is floating-point division — truncate back to a long
    // rank (values are nonnegative, so the cast is a floor); the
    // product stays well under 2^53, so the double round-trip is exact
    if (m == 0) lit(0L) else ((cnt * lit((1L << bits) - 1)) / lit(m)).cast("long")
  }

  /** Re-lay `df` along the Z-curve of 2 or 3 numeric columns using
    * EQUAL-MASS quantile ranks — the skew-robust variant of
    * [[cluster]] (see the object scaladoc for when each applies).
    *
    * Scale shape: ONE `approxQuantile` sketch pass learns all
    * columns' threshold ladders (Greenwald-Khanna; driver receives ≤
    * `buckets` doubles per column — O(KB), never rows), then the same
    * single range-exchange on the interleaved key that [[cluster]]
    * pays. At 100 TB the sketch pass is a full scan of only the
    * clustered columns; `relErr` trades sketch memory for bucket-edge
    * accuracy and only shifts bucket boundaries, never correctness
    * (stats are recorded from the actual written files). The default
    * (half the 1/256 bucket width — Greenwald-Khanna cost scales with
    * 1/relErr, so needlessly tight error taxes every row of the scan)
    * keeps edge drift within half a bucket.
    *
    * @param buckets quantile resolution per column (≤ 256 keeps the
    *                per-row rank cost at a ≤255-step codegen'd array
    *                filter; more buys nothing at realistic file counts)
    */
  def clusterQuantile(df: DataFrame, cols: Seq[String], parts: Int,
      buckets: Int = 256, relErr: Double = 0.002): DataFrame = {
    require(parts > 0, "parts must be positive")
    require(cols.size == 2 || cols.size == 3,
      s"Z-order supports 2 or 3 columns, got ${cols.size}")
    require(buckets >= 2 && buckets <= 4096,
      s"buckets must be in [2, 4096], got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val ladders = df.stat.approxQuantile(cols.toArray, probs, relErr)
    val bits = if (cols.size == 2) 16 else 21
    val ranks = cols.zip(ladders).map { case (c, thr) =>
      val t = thr.distinct.sorted.toSeq
      require(t.nonEmpty, s"quantile ranks need non-null values for $c")
      quantRank(col(c), t, bits)
    }
    val z = if (cols.size == 2) zvalue(ranks(0), ranks(1))
      else zvalue3(ranks(0), ranks(1), ranks(2))
    val tmp = "__graft_zvalue"
    df.withColumn(tmp, z)
      .repartitionByRange(parts, col(tmp))
      .sortWithinPartitions(tmp)
      .drop(tmp)
  }
}
