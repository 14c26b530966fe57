package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for round-4 tuning — NOT part of the library. */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, GridSelfJoin, Similarity}

    val docs = T.documents(spark, sfDir)
    time("warm docs count")(docs.count())

    // full q52 as graded, twice
    time("q52 run 1")(Dedup.charNgramJaccard(docs, "doc_id", "text", 3, 0.8).count())
    time("q52 run 2")(Dedup.charNgramJaccard(docs, "doc_id", "text", 3, 0.8).count())
    println("  strategy: " + Dedup.lastJaccardStrategy.get())

    // pieces: tokenization+gate vs grid
    val toks = docs.select(col("doc_id").as("id"),
      Dedup.charNgrams(3)(col("text")).as("toks"))
    time("tokenize+cache count")(toks.count())
    val tokDoc = toks.select(col("id"), size(col("toks")).as("n"),
      explode(col("toks")).as("tok"))
    time("dfreq agg + vocab collect") {
      tokDoc.groupBy("tok").agg(count(lit(1)).as("df"))
        .select("tok").limit(65537).collect().length
    }

    // grid at various block counts over the same masks
    import spark.implicits._
    val vocabSorted = time("vocab collect sorted") {
      tokDoc.select("tok").distinct().collect().map(_.getString(0)).sorted
    }
    val words = ((vocabSorted.length + 63) >>> 6)
    val vocabMap = vocabSorted.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(vocabMap)
    val rows = toks.as[(Long, Seq[String])].map { case (id, ts) =>
      val voc = bc.value
      val m = new Array[Long](words)
      ts.foreach { t => val bit = voc(t); m(bit >>> 6) |= (1L << (bit & 63)) }
      (id, (m, ts.size))
    }
    for (b <- Seq(2, 4, 8, 16, 16, 8, 4, 2)) {
      time(s"grid pairs b=$b") {
        GridSelfJoin.pairs(rows, b, 0.8) { (a, c) =>
          val (ma, na) = a; val (mb, nb) = c
          var common = 0; var w = 0
          while (w < words) { common += java.lang.Long.bitCount(ma(w) & mb(w)); w += 1 }
          common.toDouble / (na + nb - common)
        }.count()
      }
    }

    // q60 path: exact cosine grid + components at sf0.1
    val emb = T.embeddings(spark, sfDir)
    time("emb count")(emb.count())
    val nExact = time("exactCosinePairs 0.4")(
      Similarity.exactCosinePairs(emb, "vec_id", "embedding", 0.4).count())
    println(s"  exact pairs: $nExact")
    val nLsh = time("cosineNearDupPairs 0.4 (lsh pairs)")(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4).count())
    println(s"  lsh pairs: $nLsh")
    Dedup.ccDebug = true
    time("q60 cosineDedup full")(
      Dedup.cosineDedup(emb, "vec_id", "embedding", 0.4).count())
    time("q60 cosineDedup lsh")(
      Dedup.cosineDedup(emb, "vec_id", "embedding", 0.4, exact = false).count())
    Dedup.ccDebug = false
    val docs2 = T.documents(spark, sfDir)
    time("q25 minhashDedupPoly")(
      Dedup.minhashDedupPoly(docs2, "doc_id", "text", threshold = 0.5).count())

    spark.stop()
  }
}
