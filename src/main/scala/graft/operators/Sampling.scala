package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and splitting for
  * training-data pipelines (the reproducible train/eval carve-out every
  * dataset build needs; reference scope per SURVEY.md §2C "extensions").
  *
  * Bucket assignment is a pure row-local function of a key — the
  * portable 31-bit polynomial hash of the key's string rendering — so a
  * sample is reproducible across runs, engines, partition layouts, and
  * cluster sizes. `df.sample`, by contrast, is seeded per partition and
  * silently changes membership when the input is repartitioned; at
  * 100 TB that nondeterminism contaminates eval splits. Row-local, no
  * shuffle, stays in whole-stage codegen (native PolyHash31
  * expression); DuckDB recomputes the identical hash, so splits are
  * hash-verifiable end-to-end (q65).
  */
object Sampling {

  private def polyHashCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PolyHash31(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Stable bucket in [0, buckets) from the key's string rendering. */
  def hashBucket(key: Column, buckets: Int): Column = {
    require(buckets > 0, "buckets must be positive")
    pmod(polyHashCol(key.cast("string")), lit(buckets.toLong))
  }

  /** Deterministic train/eval split: rows whose bucket falls below
    * `trainPct` land in "train", the rest in "eval". Membership is a
    * function of the key alone — append-only datasets keep historical
    * rows in their original split. */
  def split(df: DataFrame, keyCol: String, trainPct: Int,
      splitCol: String = "split"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100, "trainPct must be in [0,100]")
    df.withColumn(splitCol,
      when(hashBucket(col(keyCol), 100) < trainPct, lit("train"))
        .otherwise(lit("eval")))
  }

  /** Deterministic ~pct% sample by key hash. */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be in [0,100]")
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }
}
