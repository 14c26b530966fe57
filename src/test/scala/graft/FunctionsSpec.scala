package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PolyHash31
import graft.operators.Dedup

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("poly_hash31 is registered via SparkSessionExtensions and matches the Scala impl") {
    val viaSql = spark.sql("SELECT poly_hash31('hello graft') AS h").head().getLong(0)
    assert(viaSql === Dedup.polyHash31("hello graft"))
    assert(spark.sql("SELECT poly_hash31(NULL) AS h").head().isNullAt(0))
  }

  test("native expression stays inside whole-stage codegen") {
    val docs = T.documents(spark, "/root/testdata/sf0.001").limit(20)
    val df = docs.selectExpr("doc_id", "poly_hash31(text) AS h")
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators
    assert(plan.contains("*(1) Project"), s"expected codegen'd project:\n$plan")
    assert(!plan.toLowerCase.contains("scalaudf"), s"no UDF boundary expected:\n$plan")
    val viaExpr = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScala = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> Dedup.polyHash31(r.getAs[String]("text"))).toMap
    assert(viaExpr === viaScala)
  }
}
