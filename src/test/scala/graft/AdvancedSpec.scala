package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within 5% of the exact count per group") {
    val approx = SparkEntry.queries("q56_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = T.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"group $k: approx $ap vs exact $ex")
    }
  }

  test("as-of join matches the naive max-subquery formulation") {
    import graft.operators.AsofJoin
    val od = T.orders(spark, sf)
      .groupBy(date_trunc("day", col("o_orderdate")).as("od"))
      .agg(count(lit(1)).as("n_orders"))
    val events = T.events(spark, sf).select("event_id", "ts").limit(300)
    val fast = AsofJoin.backward(events, od, "ts", "od")
    // naive: per event, the max order-day <= ts (O(n·m) pairs — the plan
    // the union+window formulation avoids), joined back for payload
    val naive = events.as("e").join(od.as("o"), col("ts") >= col("od"), "left")
      .groupBy("event_id", "ts").agg(max("od").as("mx"))
      .join(od.withColumnRenamed("od", "mx"), Seq("mx"), "left")
      .select(col("event_id"), col("n_orders"))
    val fastSel = fast.select("event_id", "n_orders")
    assert(fastSel.exceptAll(naive).isEmpty && naive.exceptAll(fastSel).isEmpty)
  }
}
