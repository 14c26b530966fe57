package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for tuning — NOT part of the library.
  * Current probe: SemDeDup blocking recall (q128) per cluster count. */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = T.embeddings(spark, sf)
      val n = emb.count()
      val ne = time(s"$sf exact kept")(
        Dedup.cosineDedup(emb, "vec_id", "embedding", 0.4).count())
      println(s"  n=$n exactKept=$ne exactDropped=${n - ne}")
      for (k <- Seq(4, 8, 16); p <- Seq(1, 2, 3)) {
        val ns = time(s"  sem k=$k p=$p kept")(
          Dedup.semDedup(emb, "vec_id", "embedding", 0.4, k, p).count())
        val power =
          if (n == ne) 1.0 else (n - ns).toDouble / (n - ne)
        println(f"  k=$k%-3d p=$p semKept=$ns power=$power%.3f")
      }
    }
    spark.stop()
  }
}
