package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, Dedup}

/** Physical-plan audit (the 100 TB posture checks from the build
  * brief): filters reach the parquet scan, projections prune the read
  * schema, small dimensions broadcast, and operators don't shuffle more
  * than their algorithm requires. These assertions pin the plan shape
  * so a regression (lost pushdown, surprise cross join, extra exchange)
  * fails CI rather than surfacing as a 100× slowdown at scale.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countIn(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("filter + projection push into the parquet scan") {
    val p = plan(T.lineitem(spark, sf)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"),
      s"missing pushed filter in:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning failed in:\n$p")
  }

  test("multi-join: small dims broadcast, no nested-loop joins") {
    val p = plan(SparkEntry.queries("q50_multi_join")(spark, sf))
    assert(countIn(p, "BroadcastHashJoin") >= 2, s"nation/region should broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"unexpected cross join:\n$p")
  }

  test("exact dedup is one shuffle (partial window, no extra exchange)") {
    val p = plan(Dedup.exact(T.documents(spark, sf), Seq("lang", "source"), "doc_id"))
    assert(countIn(p, "Exchange") === 1, s"expected exactly 1 exchange:\n$p")
  }

  test("as-of join is one shuffle over the union, not a range join") {
    val od = T.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("od"))
      .agg(count(lit(1)).as("n_orders"))
    val p = plan(AsofJoin.backward(
      T.events(spark, sf).select("event_id", "ts"), od, "ts", "od"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of must not degrade to a pair join:\n$p")
    // one exchange for the daily agg + one single-partition exchange for
    // the global window — nothing proportional to |events|×|orders|
    assert(countIn(p, "Exchange") <= 3, s"too many exchanges:\n$p")
  }

  test("minhash signatures aggregate in one shuffle with partial mins") {
    // the public API returns a CACHED relation (sigCache) whose printed
    // plan nests Final+Initial adaptive plans — pin the derivation shape
    // on the uncached builder, and the caching itself on the public one
    val p = plan(Dedup.minhashSignaturesPolyUncached(
      T.documents(spark, sf), "doc_id", "text", 3, 64))
    assert(countIn(p, "Exchange") === 1, s"expected exactly 1 exchange:\n$p")
    assert(p.contains("partial_min") || p.contains("HashAggregate"),
      s"expected map-side partial aggregation:\n$p")
    val cached = plan(Dedup.minhashSignaturesPoly(T.documents(spark, sf), "doc_id", "text"))
    assert(cached.contains("InMemoryTableScan"),
      s"public signatures should read the persisted index:\n$cached")
  }

  test("semi/anti joins stay hash joins on the key") {
    val p1 = plan(SparkEntry.queries("q41_exists_subquery")(spark, sf))
    assert(p1.contains("LeftSemi"), s"expected semi join:\n$p1")
    val p2 = plan(SparkEntry.queries("q42_not_in_subquery")(spark, sf))
    assert(p2.contains("LeftAnti"), s"expected anti join:\n$p2")
    assert(!p1.contains("CartesianProduct") && !p2.contains("CartesianProduct"))
  }

  test("exact-cosine grid is shuffle-only: no broadcast, no cartesian, no scan collect") {
    val p = plan(graft.operators.Similarity.exactCosinePairs(
      T.embeddings(spark, sf), "vec_id", "embedding", 0.4))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastExchange"),
      s"grid must not broadcast or cross-join:\n$p")
    assert(!p.contains("CollectLimit"), s"no driver collects in the plan:\n$p")
  }

  test("jaccard joins never degrade to cartesian/nested-loop pair joins") {
    // wide-bitmask path (trigram vocab > 64): grid cells, no cross join
    val wide = plan(Dedup.charNgramJaccard(
      T.documents(spark, sf).limit(40), "doc_id", "text", 3, 0.8))
    assert(!wide.contains("CartesianProduct") && !wide.contains("BroadcastNestedLoopJoin"),
      s"wide bitmask path must stay cell-keyed:\n$wide")
    // prefix-filter path: candidate join shuffles on tokens
    val before = Dedup.bitmaskDocCap
    try {
      Dedup.bitmaskDocCap = 1L
      val prefix = plan(Dedup.charNgramJaccard(
        T.documents(spark, sf).limit(40), "doc_id", "text", 3, 0.8))
      assert(Dedup.lastJaccardStrategy.get() === "prefix")
      assert(!prefix.contains("CartesianProduct") && !prefix.contains("BroadcastNestedLoopJoin"),
        s"prefix path must stay token-keyed:\n$prefix")
    } finally Dedup.bitmaskDocCap = before
  }

  test("banded candidate self-joins shuffle the stream once (reused exchange)") {
    // The LSH/minhash candidate self-join must not re-derive the banded
    // signature stream per plan reference: the stream is repartitioned
    // ONCE by (band, bucket) and the second join side reads a
    // ReusedExchange of that shuffle in the final adaptive plan. A lost
    // reuse means the signature pipeline (UDF over the whole corpus)
    // runs twice — invisible at test scale, 2x the scan cost at 100 TB.
    def reusesRepartition(df: DataFrame): Unit = {
      df.collect() // AQE: reuse is only visible in the executed plan
      val p = df.queryExecution.executedPlan.toString
      val reused = p.linesIterator.exists(l =>
        l.contains("ReusedExchange") && l.contains("REPARTITION_BY_COL"))
      assert(reused, s"no ReusedExchange over the banded repartition in:\n$p")
    }
    // disable broadcast joins for the audit: with the signature cache's
    // accurate (tiny) stats, AQE legitimately broadcasts the banded side
    // at spec scale, hiding the shuffle this test pins — at real corpus
    // sizes the relation exceeds any broadcast threshold and the
    // reused-exchange shape below is what executes
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // optional conf: when unset it FALLS BACK to the non-adaptive
    // threshold, so it must be restored by unsetting, not pinned to a
    // point-in-time value (that would sever the fallback for later
    // suites sharing this session)
    val abcast = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // cosine family: the banded stream is derived inline, so the two
      // self-join sides MUST read one reused repartition exchange
      reusesRepartition(graft.operators.Similarity.cosineNearDupPairs(
        T.embeddings(spark, sf), "vec_id", "embedding", 0.4))
      // minhash family: signatures come from the PERSISTED sigCache, a
      // stronger guarantee than exchange reuse (zero re-derivation even
      // across queries). AQE does not reuse exchanges over cached
      // adaptive subplans, so each side shuffles the slim banded stream
      // from the cache; the pinned invariant is that the expensive
      // derivation (shingle explode) appears NOWHERE in the executed
      // plan — it lives only inside the cached relation
      val mh = Dedup.minhashCandidatesPoly(
        T.documents(spark, sf), "doc_id", "text", threshold = 0.5)
      mh.collect()
      // logical-level pins (the executed plan PRINTS the cached build
      // plan inline, so textual negative checks would false-positive):
      // every plan reference resolves to the cached relation, and the
      // shingle-explode Generate survives ONLY inside it
      val opt = mh.queryExecution.optimizedPlan
      val cachedRefs = opt.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r }
      assert(cachedRefs.nonEmpty,
        s"banded stream must read the persisted signature index:\n$opt")
      val inlineShingle = opt.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate
            if g.generator.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF]) => g }
      assert(inlineShingle.isEmpty,
        s"signature derivation must not re-run outside the cache:\n$opt")
      val p = mh.queryExecution.executedPlan.toString
      assert(p.linesIterator.exists(_.contains("REPARTITION_BY_COL")),
        s"banded stream must be hash-partitioned for the self-join:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      abcast match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("q53 tf-idf builds without running any eager job (corpus count is in-plan)") {
    val tracker = spark.sparkContext.statusTracker
    // wait until the async job-event stream is quiescent, so a straggling
    // event from earlier work can't shift the before/after counts
    def settledJobCount(): Int = {
      var prev = -1
      var cur = tracker.getJobIdsForGroup(null).length
      var spins = 0
      while (cur != prev && spins < 40) { // bounded: ~10s, then fail loudly below
        prev = cur; Thread.sleep(250)
        cur = tracker.getJobIdsForGroup(null).length
        spins += 1
      }
      assert(spins < 40, "job-event stream never settled; cannot audit eager jobs")
      cur
    }
    T.documents(spark, sf).schema // parquet schema inference job, not q53's
    val before = settledJobCount()
    val df = SparkEntry.queries("q53_tfidf")(spark, sf)
    // the old eager docs.count() ran a separate job while the query was
    // still being BUILT; now building must be job-free (AQE may still
    // split the actual execution into several jobs)
    val after = settledJobCount()
    assert(after === before, s"query building ran ${after - before} eager jobs")
    assert(df.collect().nonEmpty)
  }

  test("exactCosinePairs sizing probes run once per corpus plan (cached)") {
    import graft.operators.Similarity
    val tracker = spark.sparkContext.statusTracker
    def settledJobCount(): Int = {
      var prev = -1
      var cur = tracker.getJobIdsForGroup(null).length
      var spins = 0
      while (cur != prev && spins < 40) {
        prev = cur; Thread.sleep(250)
        cur = tracker.getJobIdsForGroup(null).length
        spins += 1
      }
      assert(spins < 40, "job-event stream never settled; cannot audit eager jobs")
      cur
    }
    val emb = T.embeddings(spark, sf)
    // first build may run the two bounded probe jobs (dims + capped count)
    Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.8)
    val before = settledJobCount()
    // same corpus plan again: the (dims, count) cache must answer — no
    // jobs may run while the query is BUILT (exactCosinePairsBlock also
    // shares the cache, but its block path collects by design, so only
    // the shuffle-only builder can be audited for zero jobs)
    Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.8)
    val after = settledJobCount()
    assert(after === before,
      s"re-probing a cached corpus ran ${after - before} jobs")
  }

  test("funnel is a single aggregation shuffle (+ presentation sort)") {
    val p = plan(SparkEntry.queries("q63_funnel")(spark, sf))
    // one hash exchange for repartition(user_id), one range exchange for
    // the output ORDER BY — the staged first-after logic must stay
    // row-local (partition-local sort + single-pass state machine)
    assert(countIn(p, "Exchange") <= 2, s"expected <=2 exchanges:\n$p")
    assert(!p.contains("Join"), s"funnel must not join per stage:\n$p")
    // per-key state must be O(|stages|), not the user's event list
    assert(!p.contains("collect_list"), s"funnel must not buffer event lists:\n$p")
  }

  test("chunking and PII masking are row-local (no shuffle before the output sort)") {
    val p1 = plan(SparkEntry.queries("q69_doc_chunking")(spark, sf))
    assert(countIn(p1, "Exchange") <= 1, s"chunking must not shuffle:\n$p1")
    val p2 = plan(SparkEntry.queries("q71_pii_mask")(spark, sf))
    assert(countIn(p2, "Exchange") <= 1, s"pii masking must not shuffle:\n$p2")
  }

  test("two-phase packing broadcasts the offset table (no shard-sized join shuffle)") {
    val p = plan(SparkEntry.queries("q66_sequence_packing")(spark, sf))
    // the phase-2 offset table is |shards|x|subShards| rows — it must
    // come back as a broadcast, not a repartition of the corpus
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not re-shuffle for offsets:\n$p")
  }

  test("repetition profile is two partial aggregations (+ presentation sort)") {
    val p = plan(SparkEntry.queries("q70_repetition")(spark, sf))
    // (doc, gram) agg + (doc) agg + output ORDER BY; partial aggregation
    // must be present so the wire carries counts, not raw n-grams
    assert(countIn(p, "Exchange hashpartitioning") <= 2, s"too many shuffles:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"), s"no map-side combine:\n$p")
  }

  test("stratified sample plans a WindowGroupLimit (running top-k per group)") {
    val p = plan(SparkEntry.queries("q72_stratified_sample")(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"rank filter should push a group limit below the window:\n$p")
  }

  test("vocabulary top-k avoids a global sort; OOV joins broadcast the vocab") {
    val p1 = plan(SparkEntry.queries("q74_vocabulary")(spark, sf))
    assert(p1.contains("TakeOrderedAndProject"),
      s"vocab top-k must not globally sort the token counts:\n$p1")
    val p2 = plan(SparkEntry.queries("q75_oov_rate")(spark, sf))
    assert(p2.contains("BroadcastHashJoin"), s"vocab side must broadcast:\n$p2")
    assert(!p2.contains("SortMergeJoin"),
      s"token stream must not shuffle for the vocab join:\n$p2")
  }

  test("token budget broadcasts the offset table; no global single-partition window") {
    val p = plan(SparkEntry.queries("q77_token_budget")(spark, sf))
    // phase-2 offsets are |groups|×subShards rows — broadcast back, and
    // the corpus-side prefix sum must stay partitioned (a global window
    // would show a SinglePartition exchange)
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not re-shuffle for offsets:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"prefix sum must not serialize through one task:\n$p")
  }

  test("quantization is row-local; curriculum broadcasts one threshold row") {
    val p1 = plan(graft.operators.Similarity.quantize(
      T.embeddings(spark, sf), "embedding"))
    assert(!p1.contains("Exchange"), s"quantize must not shuffle:\n$p1")
    val p2 = plan(SparkEntry.queries("q79_curriculum")(spark, sf))
    // percentile agg collapses to one row; assignment is a broadcast
    // nested loop over a 1-row build side (a cross join by name, but
    // 1×n — the shape that replaces the global ntile sort)
    assert(p2.contains("Broadcast"), s"thresholds must broadcast:\n$p2")
    assert(countIn(p2, "Exchange SinglePartition") <= 1,
      s"only the 1-row threshold agg may single-partition:\n$p2")
  }

  test("inverted index caps postings below the window (WindowGroupLimit)") {
    val p = plan(SparkEntry.queries("q81_inverted_index")(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"posting cap should push a group limit below the window:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"term top-k must not globally sort:\n$p")
  }

  test("bigram LM wires through partial aggs; only the V row single-partitions") {
    val p = plan(SparkEntry.queries("q87_bigram_lm")(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial"),
      s"count shuffles must map-side combine:\n$p")
    // the vocabulary-size aggregate is the only legal 1-row collapse
    assert(countIn(p, "Exchange SinglePartition") <= 1,
      s"only V may single-partition:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"V must broadcast, not cartesian:\n$p")
  }

  test("global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val p = plan(T.orders(spark, sf)
      .orderBy(col("o_totalprice").desc).limit(25))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("diff reads only the files that changed between the cuts — never the table") {
    val spark2 = spark
    import spark2.implicits._
    val c = new graft.warehouse.Connector(spark,
      java.nio.file.Files.createTempDirectory("graft-diffplan").toString)
    c.createTable("tdp", spark.range(0, 20000).toDF("id"))
    val t = c.loadTable("tdp")
    val s1 = t.currentSnapshotId.get
    val before = t.read().inputFiles.toSet
    t.append(spark.range(20000, 20100).toDF("id"))
    val changed = t.read().inputFiles.toSet -- before
    val scanned = t.diff(s1).inputFiles.toSet
    assert(scanned.nonEmpty && scanned.subsetOf(changed),
      s"diff scanned ${scanned.size} files; only ${changed.size} changed — " +
        "the O(changed files) contract broke")
  }

  test("era projection keeps the single-scan fast path unless a rename is in play") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.size
    val dir = java.nio.file.Files.createTempDirectory("graft-eraplan-")
    val t = graft.warehouse.GraftTable.create(spark, dir, "t",
      Seq((1L, "a")).toDF("id", "v")).get
    t.append(Seq((2L, "b")).toDF("id", "v"))
    // plain multi-commit table: ONE vectorized scan
    assert(scanCount(t.read()) == 1)
    // ADDITIVE evolution keeps the fast path (by-name null-fill needs
    // no per-era projection — a regression here turns every evolved
    // table's read into a per-era union)
    t.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType))))
    t.append(Seq((3L, "c", "x")).toDF("id", "v", "w"))
    assert(scanCount(t.read()) == 1,
      "additive evolution must not split the read into era groups")
    // a RENAME genuinely needs per-era decode: each DISTINCT pre-rename
    // schema era projects with its own scan (two here: before and after
    // the w add), the post-rename files merge into one fast scan — and
    // crucially the count tracks ERAS, never commits
    t.renameColumn("v", "label")
    t.append(Seq((4L, "d", "y")).toDF("id", "label", "w"))
    t.append(Seq((5L, "e", "z")).toDF("id", "label", "w"))
    assert(scanCount(t.read()) == 3,
      "rename should cost one scan per distinct era, not one per commit")
    // compact re-normalizes: back to one scan
    t.compact()
    assert(scanCount(t.read()) == 1)
  }

  test("position deletes: unnamed files share one vectorized scan; one anti-join per named file") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-posplan-")
    val t = graft.warehouse.GraftTable.create(spark, dir, "t",
      spark.range(0, 100).toDF("id").coalesce(1)).get
    t.append(spark.range(100, 200).toDF("id").coalesce(1))
    t.append(spark.range(200, 300).toDF("id").coalesce(1))
    t.deletePosMor($"id" === 250L) // names the third file ONLY
    val p = plan(t.read())
    // exactly: one shared scan for the two unnamed files, one scan for
    // the named file, one sidecar scan — and ONE anti-join, never one
    // per table file (100 TB posture: the tombstone tax is O(named))
    assert(countIn(p, "LeftAnti") == 1,
      s"expected one anti-join:\n$p")
    assert(countIn(p, "FileScan parquet") == 3,
      s"expected unnamed-group + named + sidecar scans:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(t.read().count() == 299)
  }

  test("refs metadata table lists tags and open branches") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-refs-")
    val t = graft.warehouse.GraftTable.create(spark, dir, "t",
      Seq((1L, "a")).toDF("id", "v")).get
    t.tagSnapshot("v1")
    t.createBranch("wap")
    t.appendBranch("wap", Seq((2L, "b")).toDF("id", "v"))
    val refs = t.refsDf.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(refs.contains(("v1", "tag", 1L, 0L)))
    assert(refs.contains(("wap", "branch", 1L, 1L)))
    t.dropBranch("wap")
    t.dropTag("v1")
    assert(t.refsDf.count() == 0)
  }

  test("bucketed tables join and aggregate with zero hash exchanges") {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt-").toString
    T.orders(spark, sf).select(col("o_orderkey"))
      .write.bucketBy(4, "o_orderkey")
      .option("path", s"$dir/o").saveAsTable(s"o_$tag")
    T.lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice"))
      .write.bucketBy(4, "l_orderkey")
      .option("path", s"$dir/l").saveAsTable(s"l_$tag")
    val joined = spark.table(s"o_$tag").hint("merge")
      .join(spark.table(s"l_$tag"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), s"expected SMJ over bucketed scans:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join+agg must not shuffle:\n$p")
    // co-location changed the plan, not the answer
    val plain = T.orders(spark, sf).select(col("o_orderkey"))
      .join(T.lineitem(spark, sf).select(col("l_orderkey"), col("l_extendedprice")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS o_$tag")
    spark.sql(s"DROP TABLE IF EXISTS l_$tag")
  }

  test("bloom decontamination filters shingles row-locally below the verification join") {
    val docs = T.documents(spark, sf)
    val p = plan(graft.operators.Contamination.decontaminateBloom(
      docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
      "doc_id", "text", 8))
    assert(p.contains("might_contain"), s"bloom prefilter missing from plan:\n$p")
    // the prefilter must sit BELOW the shingle join: in the plan tree
    // rendering, the Filter(might_contain...) line appears after (deeper
    // than) the last join operator line, i.e. on the join's input side
    val joinIdx = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
      .map(p.indexOf).filter(_ >= 0)
    val filterIdx = p.indexOf("might_contain")
    assert(joinIdx.nonEmpty && filterIdx > joinIdx.min,
      s"might_contain must be an input-side filter of the verification join:\n$p")
  }

  test("pricing summary pushes the shipdate filter and prunes columns") {
    val p = plan(SparkEntry.queries("q01_pricing_summary")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter should reach the scan:\n$p")
    assert(!p.toLowerCase.contains("l_partkey"),
      s"unused columns should be pruned:\n$p")
  }

  test("interval join plans an equi-join where the naive BETWEEN nested-loops") {
    import graft.operators.RangeJoin
    val ev = T.events(spark, sf).select("event_id", "ts")
    val w = ev.filter(col("event_id") % 37 === 0)
      .select(col("event_id").as("window_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("ws"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
    // the declarative form: no equi-key, so Catalyst can ONLY nested-loop
    val naive = plan(ev.join(w, col("ts") >= col("ws") && col("ts") <= col("we")))
    assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"),
      s"premise: naive BETWEEN should nested-loop:\n$naive")
    // the bucketed rewrite: a plain equi-join on the bucket id
    val micros = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    val p = plan(RangeJoin.intervalJoin(ev, micros(col("ts")),
      w, micros(col("ws")), micros(col("we")), bucketWidth = 3600L * 1000000L))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed interval join must be an equi-join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash/merge equi-join:\n$p")
  }

  test("readLineage attaches ids with one broadcast join; materialized files scan plain") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-rlplan-")
    val t = graft.warehouse.GraftTable.create(spark, dir, "t",
      spark.range(1000).selectExpr("id", "id * 2 AS v")).get
    t.enableRowLineage()
    // plain (arithmetic-id) files: the rel→first map must BROADCAST —
    // a sort-merge join here would shuffle the whole table just to
    // attach ids
    val p1 = plan(t.readLineage())
    assert(p1.contains("BroadcastHashJoin"),
      s"first-row-id map must broadcast:\n$p1")
    assert(!p1.contains("SortMergeJoin") && !p1.contains("CartesianProduct"),
      s"id attach must not shuffle or cross:\n$p1")
    // after a materializing rewrite the ids are physical: NO join at
    // all — one scan reading the _row_id column
    t.compact(targetFiles = 2)
    val p2 = plan(t.readLineage())
    assert(!p2.contains("Join"), s"materialized lineage read must be join-free:\n$p2")
    assert(p2.contains("_row_id"), s"physical id column missing from scan:\n$p2")
  }

  test("a view read plans like the underlying table: pushdown survives compensation") {
    // the schema-compensation projection casts recorded columns back
    // to recorded types; in the no-drift common case SimplifyCasts
    // must erase those casts so a predicate ABOVE the view still
    // reaches the parquet scan as a pushed filter — a view must never
    // cost a full scan the bare table wouldn't
    import java.nio.file.Files
    val c = new graft.warehouse.Connector(spark,
      Files.createTempDirectory("graft-vplan-").toString)
    c.createTable("vt", spark.range(2000)
      .selectExpr("id", "id * 2 AS v", "CAST(id % 5 AS INT) AS k"))
    c.sql("CREATE VIEW vv AS SELECT id, v, k FROM vt")
    val p = plan(c.sql("SELECT id, v FROM vv WHERE id > 1500"))
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1500)"),
      s"filter above the view did not reach the scan:\n$p")
    assert(p.contains("ReadSchema: struct<id:bigint,v:bigint>"),
      s"projection above the view did not prune the read schema:\n$p")
  }

  test("nested-view planning: a 5-deep x 3-wide diamond stays bounded") {
    // view re-expansion is per-reference (each reference re-parses and
    // re-analyzes the stored text): this pins the worst graded shape —
    // a 5-level diamond where every level-k view unions all three
    // level-(k-1) views — to a sane PLANNING bound, so a view-heavy
    // dashboard statement can't silently go quadratic-exponential.
    // Each level reads the level below through ONE reference per
    // sibling (3 per view), so the full expansion is 3 + 9 + … + 3^5
    // parse+analyze passes ≈ 360 — measured ~10-20 ms each.
    import java.nio.file.Files
    val c = new graft.warehouse.Connector(spark,
      Files.createTempDirectory("graft-vdeep-").toString)
    c.createTable("dt", spark.range(100).selectExpr("id", "id * 2 AS v"))
    c.sql("CREATE VIEW d0_1 AS SELECT id, v FROM dt")
    c.sql("CREATE VIEW d0_2 AS SELECT id, v FROM dt WHERE id % 2 = 0")
    c.sql("CREATE VIEW d0_3 AS SELECT id, v FROM dt WHERE id % 3 = 0")
    (1 to 4).foreach { lvl =>
      (1 to 3).foreach { w =>
        c.sql(s"CREATE VIEW d${lvl}_$w AS " +
          s"SELECT id, v FROM d${lvl - 1}_1 UNION ALL " +
          s"SELECT id, v FROM d${lvl - 1}_2 UNION ALL " +
          s"SELECT id, v FROM d${lvl - 1}_3")
      }
    }
    val t0 = System.nanoTime()
    val df = c.sql("SELECT count(*) AS n, sum(v) AS sv FROM (" +
      "SELECT * FROM d4_1 UNION ALL SELECT * FROM d4_2 " +
      "UNION ALL SELECT * FROM d4_3)")
    val planMs = (System.nanoTime() - t0) / 1e6
    // generous CI bound: the measured quiet-box figure goes in
    // BASELINE.md; this guards against a quadratic re-expansion
    // regression, not jitter
    assert(planMs < 30000, f"nested-view planning took $planMs%.0f ms")
    assert(df.collect().head.getLong(0) > 0)
    info(f"5-deep x 3-wide diamond planned in $planMs%.0f ms")
  }
}
