package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2C). All are shuffle-partitioned on their keys; none materialize on
  * the driver, so they scale linearly with cluster size.
  */
object Dedup {

  /** Exact dedup with a deterministic keeper: the row with the smallest
    * `orderCol` per `key` survives. One hash shuffle on `key`; window
    * avoids a second shuffle since partitioning matches.
    *
    * 100 TB posture: hash-partition on the dedup key; no driver state.
    * Prefer this over `dropDuplicates`, whose keeper is
    * partition-order-dependent and thus nondeterministic across runs.
    */
  def exact(df: DataFrame, key: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Normalized-text fingerprint: lowercase, collapse whitespace, md5.
    * Catches trivially-reformatted duplicates; md5 keeps the oracle
    * (DuckDB `md5`) bit-identical.
    */
  def fingerprint(textCol: Column): Column =
    md5(regexp_replace(lower(trim(textCol)), "\\s+", " "))

  /** Exact near-dup by normalized fingerprint: deterministic keeper per
    * fingerprint group. */
  def byFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol))
    df.withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__fp")
  }

  /** Exact word-level Jaccard similarity join: pairs (a, b) with
    * `|tokens(a) ∩ tokens(b)| / |tokens(a) ∪ tokens(b)| >= threshold`,
    * a < b. Exact (no hashing), expressed relationally so DuckDB can
    * oracle it:
    *
    *   explode distinct tokens → self-join on token → count common →
    *   J = common / (|A| + |B| - common).
    *
    * Scale: the token self-join shuffles on token; frequent tokens are
    * the skew risk, so callers should stopword-filter or cap document
    * frequency upstream. For 100 TB the MinHash path below replaces the
    * quadratic-in-bucket behavior with banded LSH.
    */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(array_distinct(
          split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " "))).as("tok"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n_tok"))
    val common = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_tok", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_tok", "n_b"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Word n-gram shingles: contiguous n-word windows. */
  def wordShingles(textCol: Column, n: Int): Column = {
    val toks = split(regexp_replace(lower(trim(textCol)), "\\s+", " "), " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the min over the document's shingles of `xxhash64(shingle, seed)`.
    * Pure higher-order functions — stays inside codegen, no UDFs, one
    * shuffle (the groupBy is absent entirely: signatures are computed
    * row-local).
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(1), lit(numHashes)),
      seed => array_min(transform(shinglesCol, s => xxhash64(s, seed))))

  /** Banded LSH near-dup candidate pairs: split the signature into
    * `bands` bands of `rowsPerBand`, hash each band, and join documents
    * sharing any band bucket. Sub-quadratic: the shuffle key is
    * (band index, band hash).
    *
    * Returns candidate pairs (id_a < id_b) with their exact estimated
    * Jaccard from the full signatures, filtered at `threshold`.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
        minhashSignature(wordShingles(col(textCol), shingleWords), numHashes).as("sig"))
      .filter(size(col("sig")) === numHashes)
    val banded = sig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Connected components over candidate pairs by iterative min-label
    * propagation (small-star style), then keep the component minimum as
    * canonical. Converges in O(log n) joins for realistic dup clusters
    * (which are tiny); `maxIter` bounds pathological chains.
    *
    * Returns (id, canonical_id) for every id in `df`.
    */
  def components(df: DataFrame, idCol: String, pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val ids = df.select(col(idCol).as("id")).distinct()
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    var labels = ids.withColumn("label", col("id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges.join(labels, edges("id_b") === labels("id"))
        .groupBy(col("id_a").as("id")).agg(min("label").as("nmin"))
      val updated = labels.as("l")
        .join(neighborMin.as("n"), Seq("id"), "left")
        .select(col("id"),
          least(col("l.label"), coalesce(col("n.nmin"), col("l.label"))).as("label"))
        .localCheckpoint(eager = true) // truncate the growing lineage
      val changed = updated.as("u").join(labels.as("o"), "id")
        .filter(col("u.label") =!= col("o.label")).limit(1).count() > 0
      labels = updated
      converged = !changed
      iter += 1
    }
    labels.withColumnRenamed("label", "canonical_id")
  }

  /** Full MinHash near-dup pipeline: candidates → components → keep the
    * canonical doc per component. */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, threshold = threshold)
    val comp = components(df, idCol, cands)
    df.join(comp, df(idCol) === comp("id"))
      .filter(col(idCol) === col("canonical_id"))
      .drop("id", "canonical_id")
  }

  /** 64-bit SimHash over word tokens: sign-aggregate each bit of
    * xxhash64(token). Row-local, codegen-friendly; near-dups differ in
    * few bits (use hamming distance downstream). */
  def simhash(textCol: Column): Column = {
    val toks = split(regexp_replace(lower(trim(textCol)), "\\s+", " "), " ")
    val bitVotes = transform(sequence(lit(0), lit(63)), bit =>
      aggregate(toks, lit(0),
        (acc, t) => acc + when(call_function("shiftright", xxhash64(t), bit).bitwiseAND(1) === 1, 1).otherwise(-1)))
    aggregate(zip_with(bitVotes, sequence(lit(0), lit(63)),
        (vote, bit) => when(vote > 0, call_function("shiftleft", lit(1L), bit)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
