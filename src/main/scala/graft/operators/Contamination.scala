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
}
