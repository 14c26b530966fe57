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

  test("array_dot: registered, codegen'd, IEEE-identical to the HOF formulation") {
    // SQL registration + nulls
    assert(spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0) === 32.0)
    assert(spark.sql("SELECT array_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
      .head().isNullAt(0))
    // codegen: no ScalaUDF boundary in a similarity projection
    val emb = T.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val df = emb.selectExpr("vec_id",
      "array_dot(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) AS sq")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), s"no UDF boundary expected:\n$plan")
    // bit-identical to the sequential HOF accumulation (oracle parity)
    val hof = emb.select(col("vec_id"),
      graft.operators.Similarity.dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("sq"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native === hof)
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
