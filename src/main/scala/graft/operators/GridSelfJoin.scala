package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Shuffle-only all-pairs self-join topology (block-grid): rows hash
  * into `blocks` id-blocks, each unordered block pair {i ≤ j} is one
  * grid cell, the "low" side replicates each row across its cell row
  * (j = blk..B-1) and the "high" side across its cell column
  * (i = 0..blk), so every unordered row pair meets in EXACTLY one cell
  * (same-block cells dedup on id order). Each cell is scored with a
  * caller-supplied primitive function over cell-local blocks — the
  * block-matrix inner loop without a driver-collected corpus block.
  *
  * Scale shape: no collect, no broadcast; per-task memory O(n/blocks)
  * rows, shuffle volume O(n·blocks) rows (each row ships b+1 tagged
  * copies across ~b distinct cells). O(n²) *scoring* is inherent to
  * exact all-pairs semantics — bound the corpus or use an LSH candidate
  * path when that is too much.
  */
object GridSelfJoin {

  /** Default block count: cells = b(b+1)/2 ≈ 4× the core count — enough
    * task granularity for full parallelism, but replication (each row
    * ships b+1 copies) stays modest. Callers with corpora too big for
    * cell-sized memory pass a larger `blocks` explicitly: per-cell
    * memory shrinks as O(n/blocks) at O(blocks) replication cost. */
  def defaultBlocks(spark: org.apache.spark.sql.SparkSession): Int =
    math.max(2, math.ceil(math.sqrt(
      8.0 * spark.sparkContext.defaultParallelism)).toInt)

  /** Corpus-aware block count. The parallelism-derived [[defaultBlocks]]
    * is the GRANULARITY TARGET, applied as a cap, not a floor; two
    * corpus-volume guards adjust it:
    *
    *   - replication cap: each row ships b+1 copies, so when
    *     n·rowBytes·(b+1) would exceed `shuffleBudgetBytes`, b shrinks
    *     (a corpus with wide payloads — 8 KB masks, big vectors —
    *     shouldn't pay 17× replication for task granularity it can't
    *     use; measured on the sf0.1 trigram corpus the replication cost
    *     of b=16 at 64 B/row is noise, so small payloads keep full
    *     granularity);
    *   - memory floor: a cell materializes ~2n/b rows, so b grows until
    *     a cell fits `cellBudgetBytes` — the hard constraint, allowed to
    *     override the replication cap.
    *
    * Callers pass an exact-or-capped row count (a capped count stays
    * valid: the formula is monotone and saturates) and a per-row payload
    * estimate. */
  def adaptiveBlocks(spark: org.apache.spark.sql.SparkSession, nRows: Long,
      rowBytes: Long, cellBudgetBytes: Long = 256L << 20,
      shuffleBudgetBytes: Long = 4L << 30): Int = {
    val bPar = defaultBlocks(spark).toLong
    val volPerCopy = math.max(1L, nRows) * math.max(1L, rowBytes)
    val bShuffle = math.max(2L, shuffleBudgetBytes / volPerCopy - 1L)
    val bMem = math.ceil(
      2.0 * nRows * math.max(1L, rowBytes) / cellBudgetBytes).toLong
    math.min(4096L, math.max(math.max(2L, bMem),
      math.min(bPar, bShuffle))).toInt
  }

  /** Score all unordered pairs; emit (min id, max id, score) for pairs
    * where `score` returns a value ≥ `threshold`. `score` MUST be
    * symmetric in its two payload arguments. */
  def pairs[V](rows: Dataset[(Long, V)], blocks: Int, threshold: Double)(
      score: (V, V) => Double)(
      implicit tagEnc: Encoder[(Int, Boolean, Long, V)]): Dataset[(Long, Long, Double)] = {
    val b = math.max(2, blocks)
    val tagged = rows.flatMap { case (id, v) =>
      val blk = Math.floorMod(java.lang.Long.hashCode(id * 0x9E3779B97F4A7C15L), b)
      (blk until b).iterator.map(j => (blk * b + j, true, id, v)) ++
        (0 to blk).iterator.map(i2 => (i2 * b + blk, false, id, v))
    }
    implicit val keyEnc: Encoder[Int] = Encoders.scalaInt
    implicit val outEnc: Encoder[(Long, Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    tagged.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val lo = scala.collection.mutable.ArrayBuffer.empty[(Long, V)]
      val hi = scala.collection.mutable.ArrayBuffer.empty[(Long, V)]
      it.foreach { case (_, isLo, id, v) =>
        if (isLo) lo += ((id, v)) else hi += ((id, v))
      }
      val same = cell / b == cell % b
      lo.iterator.flatMap { case (ida, va) =>
        hi.iterator.flatMap { case (idb, vb) =>
          if (same && ida >= idb) None
          else {
            val s = score(va, vb)
            if (s >= threshold)
              Some((math.min(ida, idb), math.max(ida, idb), s))
            else None
          }
        }
      }
    }
  }
}
