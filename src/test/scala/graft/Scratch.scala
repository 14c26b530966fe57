package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main for tuning — NOT part of the library.
  * Current probe: what the service queries leave behind that slows
  * later streaming micro-batches (the bench-tail inflation). */
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $label%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  private def stats(label: String): Unit = {
    System.gc(); Thread.sleep(300)
    val rt = Runtime.getRuntime
    val used = (rt.totalMemory - rt.freeMemory) / (1 << 20)
    val threads = Thread.activeCount()
    val root = Thread.currentThread.getThreadGroup.getParent match {
      case null => Thread.currentThread.getThreadGroup
      case p =>
        var g = p; while (g.getParent != null) g = g.getParent; g
    }
    val all = new Array[Thread](root.activeCount() + 64)
    val n = root.enumerate(all, true)
    val byName = all.take(n).filter(_ != null).map(_.getName)
      .groupBy(_.replaceAll("[-0-9]+$", "")).view.mapValues(_.length)
      .toSeq.sortBy(-_._2).take(12)
    println(s"== $label: heapUsed=${used}MB threads=$n")
    byName.foreach { case (k, c) => println(f"     $c%4d  $k") }
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
    spark.sparkContext.setLogLevel("ERROR")
    val fns = SparkEntry.queries

    def run(name: String): Unit =
      time(name)(fns(name)(spark, sfDir).count())

    stats("fresh")
    run("q94_stream_tumbling")
    run("q94_stream_tumbling")
    stats("after 2x q94")
    val svc = Seq("q100_follower", "q101_wire_roundtrip", "q102_mirror",
      "q108_mirror_cdf", "q113_mirror_evolve", "q122_mirror_mor")
    for (round <- 1 to 4; q <- svc) run(q)
    stats("after 4x service block")
    run("q94_stream_tumbling")
    run("q94_stream_tumbling")
    run("q94_stream_tumbling")
    stats("after q94 again")
    spark.stop()
  }
}
