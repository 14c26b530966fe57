package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted join is row-identical to the plain join") {
    val li = T.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = T.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = SkewJoin.saltedJoin(li, o, "l_orderkey", salt = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot-key split path is row-identical too and salts only hot keys") {
    val li = T.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = T.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val hot = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc).limit(5).select("l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val split = SkewJoin.saltedJoin(li, o, "l_orderkey", salt = 8,
      hotKeys = Some(hot))
    assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty)
  }
}
