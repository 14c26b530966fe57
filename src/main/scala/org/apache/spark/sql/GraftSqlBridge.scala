package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Parser/plan bridge for graft's SQL-addressable DML
  * ([[graft.warehouse.Connector.sql]]): the session parser lives on
  * `sessionState` and unresolved plans become DataFrames via
  * `Dataset.ofRows`, both `private[sql]` — same one-object shim
  * pattern as [[GraftColumnBridge]]. Reusing Spark's OWN parser is
  * what keeps the DML routing free of hand-rolled SQL parsing. */
object GraftSqlBridge {
  def parsePlan(spark: SparkSession, sqlText: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.sqlParser.parsePlan(sqlText)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
