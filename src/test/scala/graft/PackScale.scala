package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling main (test scope, not in the library): single-phase vs
  * two-phase packing on a worst-case corpus — ONE shard value, so the
  * single-phase window serializes the whole corpus through one task
  * while the two-phase path spreads it over subShards tasks.
  *
  * Run: sbt "Test/runMain graft.PackScale [rows]"
  */
object PackScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val docs = spark.range(rows)
      .select(col("id").as("doc_id"), lit("en").as("lang"),
        (pmod(col("id") * 2654435761L, lit(900L)) + 100L).as("n_tokens"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PACKSCALE $label%-12s rows=$n%d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the scan
    docs.count()
    time("single") {
      operators.Packing.packBins(docs, "n_tokens", "doc_id", 2048L, Seq("lang"))
        .agg(max("bin")).collect(); rows
    }
    Seq(8, 32).foreach { k =>
      time(s"two-phase/$k") {
        operators.Packing.packBinsScaled(docs, "n_tokens", "doc_id", 2048L,
          Seq("lang"), k)
          .agg(max("bin")).collect(); rows
      }
    }
    spark.stop()
  }
}
