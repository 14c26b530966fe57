package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md
  * §2C): token counting, quality scoring, language-ID heuristic, and a
  * rolling-hash document fingerprint.
  *
  * Everything is a row-local Column expression built from codegen'd
  * built-ins (split / transform / aggregate / regexp) — no UDFs, no
  * shuffles, embarrassingly parallel at any scale. Each function has an
  * exact ANSI-SQL twin runnable by DuckDB, so all of these are
  * oracle-checkable (see graft.queries.Pipeline).
  */
object TextAnalysis {

  /** Whitespace tokens of single-space-normalized text. Trim first so a
    * trailing separator never yields an empty token (keeps the DuckDB
    * `string_split(trim(x), ' ')` twin exactly aligned). */
  def tokens(textCol: Column): Column =
    split(regexp_replace(trim(textCol), "\\s+", " "), " ")

  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  def uniqueTokenCount(textCol: Column): Column =
    size(array_distinct(tokens(textCol)))

  /** Mean token length in characters (0 for empty text). */
  def avgTokenLength(textCol: Column): Column = {
    val t = tokens(textCol)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, tok) => acc + length(tok)).cast("double") /
        size(t))
  }

  /** Small high-frequency English function-word list — enough signal for
    * a stopword-ratio heuristic; intentionally tiny so the quality score
    * and language-ID stay cheap and deterministic. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are")

  /** Fraction of tokens that are English stopwords (0 for empty text). */
  def stopwordRatio(textCol: Column): Column = {
    val t = tokens(textCol)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, tok => tok.isin(EnglishStopwords: _*))).cast("double") /
        size(t))
  }

  /** Fraction of non-alphanumeric, non-space characters — a punctuation/
    * noise proxy (0 for empty text). */
  def punctRatio(textCol: Column): Column = {
    val s = trim(textCol)
    when(length(s) === 0, lit(0.0)).otherwise(
      (length(s) - length(regexp_replace(s, "[^a-zA-Z0-9 ]", "")))
        .cast("double") / length(s))
  }

  /** Composite quality score in [0, 1]: long-enough documents with
    * natural-language-ish stopword density and low punctuation noise
    * score high. The exact formula matters less than its determinism and
    * monotonicity in each signal; thresholds follow common heuristic
    * text filters (Gopher-style length/stopword rules).
    */
  def qualityScore(textCol: Column): Column = {
    val lenScore = least(tokenCount(textCol).cast("double") / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(textCol) / 0.05, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(textCol) * 5.0)
    round((lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2), 6)
  }

  /** Stopword-density language-ID heuristic: texts whose English
    * stopword ratio clears `threshold` are labeled "en", else "unknown".
    * (A production version scores several per-language lists; the test
    * corpus is synthetic word soup, so one list demonstrates the shape.)
    */
  def langIdGuess(textCol: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(textCol) >= threshold, lit("en")).otherwise(lit("unknown"))

  /** Rolling polynomial document fingerprint (Karp–Rabin style) over the
    * token stream: fold `h = (h * 131 + ascii(tok) + len(tok)) mod p`
    * with p = 1e9+7. The modulus keeps every intermediate < 2^40, so the
    * arithmetic is overflow-free int64 on both Spark and DuckDB
    * (`list_reduce` twin) — exact cross-engine equality, unlike
    * engine-specific hash builtins. */
  def rollingFingerprint(textCol: Column): Column =
    aggregate(
      transform(tokens(textCol), t => (ascii(t) + length(t)).cast("long")),
      lit(0L),
      (acc, v) => (acc * 131L + v) % 1000000007L)

  /** Lowercased whitespace tokens (the dedup-side normalization). */
  def tokensLower(textCol: Column): Column =
    split(regexp_replace(lower(trim(textCol)), "\\s+", " "), " ")

  /** Corpus vocabulary: the `k` most frequent lowercase tokens with
    * dense ranks — the vocab-building pass of a tokenizer/embedding
    * pipeline. Returns (tok, freq, token_id) with token_id 1..k by
    * (freq desc, tok).
    *
    * Scale: explode → one partial-agg count shuffle (heavy hitters are
    * combined map-side, so stopword skew never concentrates raw rows),
    * then a global top-k (`TakeOrderedAndProject`, not a full sort) and
    * a rank window over only the k survivors. */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("tok"))
    df.select(explode(tokensLower(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(k)
      .withColumn("token_id", row_number().over(w))
  }

  /** Per-document out-of-vocabulary rate against a (small) vocabulary:
    * (idCol, n_tokens, n_oov, oov_rate). The vocab side broadcasts; one
    * shuffle on the document id. The standard "does this doc look like
    * the corpus the tokenizer was built for" quality gate. */
  def oovRate(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(tokensLower(col(textCol))).as("tok"))
      .join(broadcast(vocab.select(col("tok"), lit(1).as("__v"))),
        Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 4))

  /** BM25-scored top-k retrieval (Okapi BM25, Robertson et al., with
    * the non-negative `ln(1 + …)` idf): rank documents against a bag
    * of query terms — the relevance-mining pass a training-data
    * pipeline runs to pull topic-focused subsets out of a web-scale
    * corpus. Returns (idCol, bm25) for the `k` best documents, scored
    * as Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) and
    * rounded to 6 places so the cut is engine-deterministic (ties
    * break by id).
    *
    * Scale: document length is ROW-LOCAL (the size of the token
    * array — no corpus-wide shuffle for dl); N and avgdl are one
    * broadcast scalar row; term document-frequencies aggregate only
    * rows already filtered to the query terms, so the single keyed
    * shuffle carries O(matching (doc, term) pairs), not O(corpus
    * tokens); the df and stats sides broadcast into the scoring join;
    * the top-k cut is TakeOrdered, not a full sort. */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, "k must be positive")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val withToks = df.select(col(idCol),
        tokensLower(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val stats = withToks.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val hits = withToks
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__tok"))
      .filter(col("__tok").isin(terms: _*))
    val tf = hits.groupBy(col(idCol), col("__dl"), col("__tok"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = hits.select(col(idCol), col("__tok")).distinct()
      .groupBy("__tok").agg(count(lit(1)).cast("double").as("__df"))
    tf.join(broadcast(dfreq), "__tok")
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__s", col("__idf") * (col("__tf") * (k1 + 1.0)) /
        (col("__tf") +
          (col("__dl") / col("__avgdl") * b + (1.0 - b)) * k1))
      .groupBy(col(idCol))
      .agg(round(sum(col("__s")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Collocation extraction: the `k` strongest two-word associations by
    * lift = p(a,b) / (p(a)·p(b)) — PMI's argument, kept un-logged so the
    * score is a chain of IEEE mul/div that DuckDB reproduces
    * bit-identically (libm `ln` may differ at the last ulp across
    * engines and flip rounded ties).
    *
    * Scale: bigram + unigram counts are partial-agg shuffles; the two
    * unigram attachments join on the token (vocabulary-sized, not
    * corpus-sized); the (N_tokens, N_bigrams) totals broadcast as one
    * row. Output: (a, b, c_ab, lift) top-k by (lift desc, a, b).
    */
  def collocations(df: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 50): org.apache.spark.sql.DataFrame = {
    val toks = df.select(explode(tokensLower(col(textCol))).as("tok"))
    val multi = df.select(col(textCol))
      .filter(size(tokensLower(col(textCol))) >= 2)
    val bi = multi.select(
      explode(Dedup.wordShinglesAllCompiled(2)(col(textCol))).as("bg"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totals = toks.agg(count(lit(1)).as("nt"))
      .crossJoin(bi.agg(count(lit(1)).as("nb")))
    bi.groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("a", split(col("bg"), " ")(0))
      .withColumn("b", split(col("bg"), " ")(1))
      .join(uni.select(col("tok").as("a"), col("cnt").as("c_a")), "a")
      .join(uni.select(col("tok").as("b"), col("cnt").as("c_b")), "b")
      .crossJoin(broadcast(totals))
      // left-assoc mul/div chain — the oracle spells the same order
      .withColumn("lift",
        round(col("c_ab").cast("double") / col("c_a") / col("c_b") *
          col("nt") / col("nb") * col("nt"), 4))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
      .select("a", "b", "c_ab", "lift")
  }

  /** Per-document n-gram repetition profile — the "is this doc mostly
    * one phrase looping" signal repetition filters key on (boilerplate,
    * generated spam, and scraped nav bars all repeat short n-grams).
    *
    * Returns (idCol, n_shingles, n_distinct, max_rep, rep_ratio) where
    * max_rep is the highest occurrence count of any single n-gram and
    * rep_ratio = 1 − distinct/total (0 = no repetition).
    *
    * Scale: explode to the n-gram multiset (compiled tokenizer), two
    * hash aggregations — (doc, n-gram) then (doc) — both with map-side
    * partial aggregation; the shuffle key is never skewed beyond one
    * document's n-gram diversity. */
  def repetitionProfile(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
        explode(Dedup.wordShinglesAllCompiled(n)(col(textCol))).as("__sh"))
      .groupBy(col(idCol), col("__sh"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        sum("__c").as("n_shingles"),
        count(lit(1)).as("n_distinct"),
        max("__c").as("max_rep"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") /
          col("n_shingles").cast("double"), 4))

  /** Token frequency spectrum (Zipf profile): how many distinct tokens
    * occur with each order-of-magnitude frequency — the corpus-health
    * summary that exposes boilerplate floods (fat head) or OCR noise
    * (fat singleton tail). Bucket = bit length of the count
    * (1, 2, 3–4, 5–8, …): pure integer arithmetic via the binary string
    * rendering, so both engines bucket identically — `floor(log2(c))`
    * would ride on libm and can flip at exact powers of two.
    *
    * Scale: one partial-agg token-count shuffle, then an agg over the
    * (vocabulary-sized) counts — the spectrum itself is ≤64 rows. */
  def freqSpectrum(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(tokensLower(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .groupBy(length(bin(col("freq"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_tokens"), sum("freq").as("n_occurrences"))
      .withColumn("bucket_lo", expr("CAST(pow(2, bucket - 1) AS BIGINT)"))

  /** Inverted index over the corpus: for each of the `k` highest-df
    * terms, the document frequency and the first `maxPostings` doc ids
    * (ascending) — the bounded-postings shape of a real index build
    * (production postings are delta-encoded chunks, never one
    * unbounded array; the cap keeps the per-term state and the output
    * row bounded no matter how common the term).
    *
    * Scale: distinct (term, doc) pairs in one partial-agg shuffle;
    * per-term posting cap via a rank filter Spark plans as
    * WindowGroupLimit (running top-k per task, no full posting sort);
    * df counted over ALL pairs on the same shuffle key, so the join of
    * the two aggregates is co-partitioned. */
  def invertedIndex(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, maxPostings: Int)
      : org.apache.spark.sql.DataFrame = {
    require(k > 0 && maxPostings > 0, "k and maxPostings must be positive")
    val pairs = df.select(col(idCol).as("__id"),
        explode(tokensLower(col(textCol))).as("tok"))
      .distinct()
    val dfreq = pairs.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tok")).orderBy(col("__id"))
    val postings = pairs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPostings)
      .groupBy("tok")
      .agg(sort_array(collect_list(col("__id"))).as("postings"))
    dfreq.join(postings, Seq("tok"))
      .orderBy(col("df").desc, col("tok")).limit(k)
  }

  /** BPE merge training: learn `numMerges` byte-pair-encoding merges
    * from the corpus — the actual tokenizer-training step (q51's
    * regex splitter consumes a vocabulary like the one this builds).
    *
    * Shape: the CORPUS-side work — counting distinct words — is one
    * distributed partial-agg shuffle; everything after runs on the
    * (word, count) VOCABULARY, which is dictionary-sized by
    * construction (standard BPE trains on word counts, not the raw
    * corpus). The vocab is collected under an explicit row budget —
    * a bounded dimension collect like the Jaccard bitmask gate, loud
    * when exceeded (at 100 TB a word vocab is millions of rows, not
    * billions; raise the budget or pre-prune hapax words if it trips).
    *
    * Merge selection is fully deterministic: best pair by (count desc,
    * left asc, right asc). Words carry an end-of-word marker "</w>" so
    * suffix merges don't leak across word boundaries.
    *
    * @return merges as (rank, left, right, pair_count), rank 1..n */
  def bpeTrain(df: org.apache.spark.sql.DataFrame, textCol: String,
      numMerges: Int, maxVocabRows: Int = 4 << 20)
      : org.apache.spark.sql.DataFrame = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = df.sparkSession
    val grouped = df
      .select(explode(tokensLower(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
    // ONE ordered pass serves both budget detection and the fallback:
    // TakeOrderedAndProject (per-partition heaps + driver merge, not a
    // global sort) fetches budget+1 rows; row budget+1 existing is the
    // over-budget signal and the first budget rows ARE the top-frequency
    // sample. Degrade, don't die (the bitmask-gate stance): at 100 TB a
    // word vocab can exceed any fixed driver budget — the kept
    // top-frequency words (count desc, word asc: deterministic) carry
    // almost all pair mass.
    val ordered = grouped.orderBy(col("c").desc, col("w"))
      .limit(maxVocabRows + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wordCounts =
      if (ordered.length <= maxVocabRows) ordered
      else {
        System.err.println(s"[graft] bpeTrain: word vocabulary exceeds " +
          s"the $maxVocabRows-row training budget; training on the " +
          s"$maxVocabRows most frequent words (rare-word pair mass is " +
          "dropped — raise maxVocabRows to include it)")
        ordered.take(maxVocabRows)
      }
    // symbol sequences: chars + end-of-word marker
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toArray :+ "</w>", c)
    }
    val merges = Array.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(
          v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) continue = false
      else {
        val ((l, r), cnt) = pairCounts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((rank, l, r, cnt))
        val lr = l + r
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += lr; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), c)
          }
        }
        rank += 1
      }
    }
    import spark.implicits._
    merges.result().toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** BPE encoding with a learned merge table: the apply side of
    * [[bpeTrain]]. The merge ranks broadcast to every executor
    * (tokenizer-sized — exactly what inference tokenizers ship); each
    * word then merges its lowest-rank adjacent pair until none
    * applies — the standard greedy BPE application. Row-local, one
    * narrow map over the corpus.
    *
    * When `rankAppsCol` is set, the row additionally carries a
    * `maxRank`-long array counting how many times each merge rank
    * APPLIED in this document. This is the q89 grading hook (ADVICE
    * r8): for a table trained on the corpus being encoded, every
    * trained merge must apply at least once corpus-wide — merge k's
    * operands can only be single characters or products of merges
    * < k (training picks pairs of symbols that exist at step k), so
    * greedy lowest-rank application replays training in rank order
    * and reproduces each merge's training-time pair_count ≥ 1. A
    * truncated, permuted, or foreign merge table breaks the replay
    * (an out-of-order merge starves the merges whose products it
    * consumes) and zeroes some rank's count. Counting is a long-array
    * increment inside the existing merge loop — row-local, free.
    *
    * @return input plus `outCol`: the document's BPE token sequence */
  def bpeEncode(df: org.apache.spark.sql.DataFrame, textCol: String,
      merges: org.apache.spark.sql.DataFrame,
      outCol: String = "bpe_tokens",
      rankAppsCol: String = null): org.apache.spark.sql.DataFrame = {
    val rankRows = merges
      .select(col("left"), col("right"), col("rank").cast("int"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
    // A duplicate (left,right) key would make one of its ranks
    // unreachable in the greedy lookup below (toMap keeps the last) and
    // spuriously flip q89's merges_ok replay verdict on a CORRECT
    // pipeline. Training can in principle re-learn a pair whose string
    // re-forms via a different merge path, so fail LOUD here instead of
    // letting the grading invariant rot silently.
    require(rankRows.map(_._1).distinct.length == rankRows.length,
      "merge table has duplicate (left,right) pairs at different ranks — " +
        "greedy rank lookup cannot represent it; dedupe the table first")
    val ranks: Map[(String, String), Int] = rankRows.toMap
    val maxRank = if (ranks.isEmpty) 0 else ranks.values.max
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    val enc = udf { text: String =>
      if (text == null) null.asInstanceOf[(Array[String], Array[Long])]
      else {
        val rk = bc.value
        val apps = new Array[Long](maxRank)
        val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .flatMap { w =>
            var syms = w.map(_.toString).toVector :+ "</w>"
            var done = false
            while (!done && syms.length > 1) {
              var bestI = -1; var bestR = Int.MaxValue
              var i = 0
              while (i < syms.length - 1) {
                rk.get((syms(i), syms(i + 1))).foreach { r =>
                  if (r < bestR) { bestR = r; bestI = i }
                }
                i += 1
              }
              if (bestI < 0) done = true
              else {
                apps(bestR - 1) += 1L
                syms = (syms.take(bestI) :+
                  (syms(bestI) + syms(bestI + 1))) ++ syms.drop(bestI + 2)
              }
            }
            syms
          }
        (toks, apps)
      }
    }
    val tmp = s"__bpe_struct_$outCol"
    val withStruct = df.withColumn(tmp, enc(col(textCol)))
      .withColumn(outCol, col(s"$tmp._1"))
    val out = if (rankAppsCol == null) withStruct
      else withStruct.withColumn(rankAppsCol, col(s"$tmp._2"))
    out.drop(tmp)
  }

  /** Bigram language-model scoring: train an add-one-smoothed bigram
    * model on the corpus itself and score every document by its average
    * negative log-probability per bigram — the classic
    * perplexity-style quality filter (fluent text that looks like the
    * corpus scores low; word soup and boilerplate-stitched text score
    * high).
    *
    * Scale: bigram and unigram counts are two partial-agg shuffles
    * (vocabulary-sized outputs); scoring joins each doc bigram to the
    * count tables on the bigram/unigram keys and rolls up per doc —
    * every join key is a token or token pair, never the corpus.
    * `V` (the smoothing denominator's vocabulary size) is a one-row
    * aggregate broadcast into the probability expression.
    *
    * Determinism note: the score is a sum of `ln` terms; Spark and
    * DuckDB both evaluate libm `log` within 1 ulp, so the per-doc sum
    * agrees to ~1e-13 relative — rounding the AVERAGE to 4 dp leaves
    * orders of magnitude of slack (asserted by the q87 oracle
    * hash-match at every round).
    *
    * Output: (idCol, n_bigrams, avg_nll) — docs shorter than 2 tokens
    * are absent (no bigrams to score). */
  def bigramLmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      tokensLower(col(textCol)).as("__toks"))
    // (id, a, b) bigram pairs: zip the token list with its own tail
    val pairs = toks.select(col("__id"),
      explode(zip_with(
        expr("slice(__toks, 1, size(__toks) - 1)"),
        expr("slice(__toks, 2, size(__toks) - 1)"),
        (x, y) => struct(x.as("a"), y.as("b")))).as("bg"))
      .select(col("__id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val uni = toks.select(explode(col("__toks")).as("a"))
      .groupBy("a").agg(count(lit(1)).as("ca"))
    val big = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val v = uni.agg(count(lit(1)).as("__v"))
    pairs
      .join(big, Seq("a", "b"))
      .join(uni, Seq("a"))
      .crossJoin(broadcast(v))
      .withColumn("__nll",
        -log((col("cab") + 1).cast("double") /
          (col("ca") + col("__v")).cast("double")))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__nll")), 4).as("avg_nll"))
  }

  /** Shingle-novelty profile: for each document, the share of its
    * distinct word n-grams whose corpus-wide FIRST occurrence (minimum
    * doc id) is this document — the "how much genuinely new text does
    * this doc add" signal an incremental crawl uses to rank candidate
    * additions (a near-copy of earlier material scores ~0).
    *
    * Scale: distinct shingles explode row-locally; first-occurrence is
    * one partial-agg min shuffle on the shingle (near-unique key, so
    * skew-bounded); the join back is on the same shuffle key
    * (co-partitioned); the final doc rollup is one more partial agg.
    * Output: (idCol, n_shingles, n_novel, novelty). */
  def noveltyProfile(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      explode(Dedup.wordShinglesCompiled(n)(col(textCol))).as("__s"))
    val first = sh.groupBy("__s").agg(min("__id").as("__first"))
    sh.join(first, Seq("__s"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles"), 4))
  }

  /** Curriculum bucketing: assign each document a difficulty bucket
    * 1..n from exact quality-score quantiles — the ordering step of a
    * curriculum-learning data loader. A global `ntile` window would
    * serialize the corpus through one task; instead the (n−1) exact
    * percentile thresholds are one aggregate row broadcast back, and
    * assignment is a row-local threshold scan: bucket i ⇔ score ≤ t_i.
    * Exact-`percentile` interpolation matches DuckDB `percentile_cont`
    * (the q49 equivalence), so the layout is hash-verifiable.
    *
    * At 100 TB swap the exact percentile for `approx_percentile` — the
    * plan shape (tiny agg + broadcast + row-local CASE) is unchanged;
    * exact is kept here as the oracle-checkable baseline. */
  def curriculum(df: org.apache.spark.sql.DataFrame, textCol: String,
      nBuckets: Int, scoreCol: String = "score",
      bucketCol: String = "bucket"): org.apache.spark.sql.DataFrame = {
    require(nBuckets > 1, "nBuckets must be > 1")
    val scored = df.withColumn(scoreCol, qualityScore(col(textCol)))
    val pcts = (1 until nBuckets).map(_.toDouble / nBuckets)
    val thresholds = scored.agg(
      expr(s"percentile(`$scoreCol`, array(${pcts.mkString(",")}))")
        .as("__t"))
    val bucket = (1 until nBuckets).reverse.foldLeft(lit(nBuckets)) {
      case (acc, i) =>
        when(col(scoreCol) <= element_at(col("__t"), i), lit(i)).otherwise(acc)
    }
    scored.crossJoin(broadcast(thresholds))
      .withColumn(bucketCol, bucket)
      .drop("__t")
  }
}
