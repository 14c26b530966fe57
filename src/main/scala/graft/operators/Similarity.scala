package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an embedding column (SURVEY.md §2C).
  *
  * All scoring stays in higher-order functions (`zip_with`/`aggregate`)
  * — codegen'd, no UDFs, null-safe. Vectors are cast to double before
  * arithmetic so the DuckDB oracle (which computes in double) matches.
  */
object Similarity {

  /** Dot product of two numeric array columns (double math). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest neighbors (cosine) for each query vector.
    *
    * Brute force: |queries| × |corpus| scored pairs. The corpus side
    * streams; the query side should be small and is broadcast, so the
    * plan is a broadcast nested-loop with no shuffle until the per-query
    * top-k window. This is the CORRECTNESS baseline; at 100 TB use
    * `lshTopK` (bucketed candidates) instead.
    *
    * @return (query_id, neighbor_id, sim, rank), rank 1..k per query
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Random-hyperplane signature (SimHash for vectors): bit i = sign of
    * dot(v, h_i) where h_i is a deterministic pseudo-random hyperplane
    * derived from xxhash64(dim, seed) — reproducible across runs and
    * engines without storing the planes.
    */
  def hyperplaneSignature(vecCol: Column, bits: Int): Column =
    aggregate(
      zip_with(
        transform(sequence(lit(0), lit(bits - 1)), b =>
          aggregate(
            zip_with(vecCol, sequence(lit(0), size(vecCol) - 1), (x, i) =>
              x.cast("double") *
                // hash → uniform in [-1, 1): cheap fixed hyperplane
                (xxhash64(i, lit(b * 7919)).cast("double") / lit(Long.MaxValue.toDouble))),
            lit(0.0), (acc, v) => acc + v)),
        sequence(lit(0), lit(bits - 1)),
        (proj, bit) => when(proj > 0, call_function("shiftleft", lit(1L), bit)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))

  /** Approximate top-k via LSH bucketing: candidates share a band of the
    * hyperplane signature; exact cosine re-ranks candidates only.
    *
    * Scale path: the candidate join shuffles on (band, bucket) — the
    * |corpus|×|queries| cross product never materializes. Recall is
    * tuned by (bits, bands): more bands → more candidates → higher
    * recall, more work.
    *
    * @return (query_id, neighbor_id, sim, rank) — same shape as
    *         bruteForceTopK, so callers can A/B recall
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val rowsPerBand = bits / bands
    def banded(df: DataFrame, id: String, vec: String): DataFrame = {
      val sig = hyperplaneSignature(col(vec), bits)
      df.select(col(id), col(vec), sig.as("sig"))
        .select(col(id), col(vec),
          posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
            call_function("shiftright", col("sig"), b * rowsPerBand)
              .bitwiseAND((1L << rowsPerBand) - 1))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    }
    val qb = banded(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv")
    val cb = banded(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id", "cv")
    val cands = cb.join(qb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cands
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Exact pairwise near-duplicate pairs: all (a < b) with cosine >=
    * threshold. O(n²) scored pairs — the oracle-checkable CORRECTNESS
    * baseline; at scale use `cosineNearDupPairs` (LSH-bucketed) below.
    * The self cross-join broadcasts one side when small; at 100 TB the
    * LSH path replaces this entirely. */
  def exactCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Pairwise near-duplicate detection on embeddings: pairs with cosine
    * >= threshold, via LSH candidates (scale) — used for
    * embedding-cosine near-dup dedup. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val rowsPerBand = bits / bands
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      hyperplaneSignature(col(vecCol), bits).as("sig"))
    val banded = sig.select(col("id"), col("v"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          call_function("shiftright", col("sig"), b * rowsPerBand)
            .bitwiseAND((1L << rowsPerBand) - 1))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }
}
