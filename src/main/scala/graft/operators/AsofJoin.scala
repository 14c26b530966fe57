package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of (temporal) join: for each left row, attach the latest
  * right row with `rightTime <= leftTime`, optionally per equi-key.
  *
  * Physical strategy: ONE shuffle, no range join. Both sides are tagged
  * and unioned, then a single window pass ordered by (time, side) takes
  * `last(right payload, ignoreNulls)` — right rows sort before left rows
  * at equal timestamps, so the match is inclusive (`<=`). This is the
  * scalable formulation: a naive `left join on rt <= lt` + max-window
  * materializes O(n·m) pairs and a BroadcastNestedLoopJoin, while the
  * union-window plan is O(n+m) rows shuffled once on (keys) and sorted
  * within partitions — the same plan shape at 100 TB.
  *
  * Equivalent to DuckDB's `ASOF LEFT JOIN` (the oracle for q40).
  */
object AsofJoin {

  def backward(left: DataFrame, right: DataFrame, leftTime: String,
      rightTime: String, by: Seq[String] = Nil): DataFrame = {
    val rightPayload = right.columns.filterNot(c => c == rightTime || by.contains(c))
    val lCols = left.columns

    val taggedRight = right.select(
      (by.map(col) :+ col(rightTime).as("__t")) :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
      .withColumn("__isLeft", lit(0))
      .withColumn("__l", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          left.schema.fields.map(f => f.copy(nullable = true)))))
    val taggedLeft = left.select(
      (by.map(col) :+ col(leftTime).as("__t")) :+
        struct(lCols.map(col): _*).as("__l"): _*)
      .withColumn("__isLeft", lit(1))
      .withColumn("__r", lit(null).cast(taggedRight.schema("__r").dataType))
      .select(taggedRight.columns.map(col): _*) // align column order

    val keys: Seq[Column] = if (by.isEmpty) Seq(lit(1)) else by.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isLeft") === 1)
      .select(lCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
