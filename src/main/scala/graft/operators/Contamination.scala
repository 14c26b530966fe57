package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share long
  * word n-gram shingles with an evaluation/benchmark set — the overlap
  * check run before any serious LLM training corpus ships (verbatim or
  * near-verbatim benchmark leakage inflates eval scores).
  *
  * Shape: explode both sides to their DISTINCT n-word shingles
  * (compiled tokenizer, one pass), project the benchmark side to a
  * distinct shingle set, and count matches per training doc. The
  * shuffle key is the shingle — sub-quadratic (|matches| work, not
  * |train|×|bench|), skew-bounded because long shingles are
  * near-unique. The benchmark shingle set is small by nature (eval
  * suites are thousands of docs, not billions), so Catalyst broadcasts
  * it; the training side streams.
  */
object Contamination {

  /** (id, n_shared) for every `corpus` doc sharing at least one distinct
    * `n`-word shingle with `benchmark`; docs with no overlap are absent
    * (semi-join semantics — filter or anti-join downstream as needed). */
  def overlap(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val sh = Dedup.wordShinglesCompiled(n)
    // per-doc shingles are already distinct (set semantics in the
    // tokenizer), so the per-id match count IS the distinct-shared count
    val corpusSh = corpus.select(col(idCol).as("id"),
      explode(sh(col(textCol))).as("shingle"))
    val benchSh = benchmark
      .select(explode(sh(col(textCol))).as("shingle")).distinct()
    corpusSh.join(benchSh, "shingle")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The operator a pipeline actually runs before shipping: the CLEAN
    * corpus — every row of `corpus` sharing NO `n`-word shingle with
    * `benchmark`. Same shingle-keyed shuffle shape as [[overlap]]; the
    * contaminated-id set (small: bounded by |corpus rows that match|) is
    * left-anti-joined against the full corpus, keeping all original
    * columns. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val sh = Dedup.wordShinglesCompiled(n)
    val corpusSh = corpus.select(col(idCol), explode(sh(col(textCol))).as("shingle"))
    val benchSh = benchmark
      .select(explode(sh(col(textCol))).as("shingle")).distinct()
    val dirty = corpusSh.join(benchSh, "shingle")
      .select(col(idCol)).distinct()
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] with a BLOOM-FILTER PREFILTER — the 100 TB scale
    * path. The exact form ships every corpus shingle into the
    * benchmark join; at trillions of shingles that stream IS the cost
    * even when the bench side broadcasts. Here a bloom filter over the
    * benchmark's shingle hashes (built by Spark's codegen'd
    * `bloom_filter_agg` — the same machinery Catalyst's runtime
    * row-level filtering injects) is embedded in the plan as a binary
    * literal, and `might_contain` drops non-matching corpus shingles
    * ROW-LOCALLY, before any join I/O: only the ~fpp false-positive
    * sliver plus true overlaps reach the exact verification join. Bloom
    * filters have NO false negatives, so the result is bit-identical to
    * [[decontaminate]] — the prefilter is pure plan surgery (graded as
    * q116, which hash-matches the exact oracle and witnesses the
    * selectivity).
    *
    * Driver memory is bounded by `numBits` (default 8 Mbit = 1 MB — a
    * deliberately bounded collect of the small-by-nature benchmark
    * side, same stance as the IVF quantizer); size `estItems` near the
    * true distinct-shingle count of the benchmark to keep fpp low —
    * over-filled blooms degrade toward pass-everything, which stays
    * CORRECT (more rows verified exactly) but loses the prefilter win. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      estItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val benchSh = benchShingles(benchmark, textCol, n)
    val bloom = benchBloom(benchSh, estItems, numBits)
    if (bloom == null) return corpus // empty benchmark: nothing to scrub
    val sh = Dedup.wordShinglesCompiled(n)
    val corpusSh = corpus.select(col(idCol), explode(sh(col(textCol))).as("shingle"))
    val candidates = corpusSh.filter(mightContain(bloom, col("shingle")))
    // exact verification join over the surviving sliver only
    val dirty = candidates.join(benchSh, "shingle")
      .select(col(idCol)).distinct()
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** Distinct n-word shingles of the benchmark side (the bloom's item
    * domain and the exact join's build side). */
  def benchShingles(benchmark: DataFrame, textCol: String, n: Int): DataFrame =
    benchmark.select(
      explode(Dedup.wordShinglesCompiled(n)(col(textCol))).as("shingle"))
      .distinct()

  /** Serialized bloom filter over the shingles' xxhash64 values — built
    * by Spark's codegen'd `bloom_filter_agg` (the machinery Catalyst's
    * runtime row-level filtering injects); null for an empty input.
    * Bounded driver memory: ≤ `numBits`/8 bytes. */
  def benchBloom(benchSh: DataFrame, estItems: Long = 1000000L,
      numBits: Long = 8388608L): Array[Byte] = {
    import org.apache.spark.sql.GraftColumnBridge.{column => ec, expression => ex}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val bloomAgg = ec(new BloomFilterAggregate(
      ex(xxhash64(col("shingle"))), Literal(estItems), Literal(numBits))
      .toAggregateExpression())
    benchSh.agg(bloomAgg.as("bf")).head.getAs[Array[Byte]]("bf")
  }

  /** Row-local `might_contain` predicate over the serialized bloom —
    * embedded as a plan literal, evaluated inside codegen; the
    * prefilter that keeps 100 TB of clean shingles out of the join. */
  def mightContain(bloom: Array[Byte],
      shingle: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column => ec, expression => ex}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    ec(BloomFilterMightContain(
      Literal(bloom, org.apache.spark.sql.types.BinaryType),
      ex(xxhash64(shingle))))
  }
}
