package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement probe (r21): per-phase timing of the commit
  * primitive. Deleted before the round ends if it stops earning its
  * keep; not part of the driver contract. */
object ProbeCommit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val orders = graft.T.orders(spark, d).select(col("o_orderkey"),
      round(col("o_totalprice"), 2).as("price"))
    orders.count() // warm
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rnd =>
      println(s"ROUND $rnd")
      val wh = java.nio.file.Files.createTempDirectory("probe")
      val t = timed("create")(graft.warehouse.GraftTable
        .create(spark, wh.resolve("t"), "t", orders).get)
      timed("append plain")(t.append(orders.limit(5000)))
      timed("append plain 2")(t.append(orders.limit(5000)))
      timed("append stats")(t.append(orders.limit(5000), statsCols = Seq("o_orderkey")))
      timed("append bloom")(t.append(orders.limit(5000), bloomCols = Seq("o_orderkey")))
      timed("read.count")(t.read().count())
      timed("read.count 2")(t.read().count())
      timed("metaCount")(t.metaCount())
      timed("deleteWhere")(t.deleteWhere(col("o_orderkey") % 10 === 3))
      timed("deletePosMor")(t.deletePosMor(col("o_orderkey") % 10 === 4))
      timed("read.count 3")(t.read().count())
      timed("upsert")(t.upsert(orders.limit(2000)
        .withColumn("price", round(col("price") * 2, 2)), Seq("o_orderkey")))
      timed("changeFeed.count")(t.changeFeed(1L,
        t.currentSnapshotId.get).count())
    }
    spark.stop()
  }
}
