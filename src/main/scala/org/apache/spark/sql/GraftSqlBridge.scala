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

  /** Decode a SQL `PARTITIONED BY` transform into
    * `(kind, column, param)` — the concrete transform case classes
    * (`IdentityTransform`, `BucketTransform`, …) are `private[sql]`,
    * so the match must live behind this bridge. Nested field
    * references and unsupported transforms return the `describe()`
    * text under kind `"?"` for the caller's own refusal message. */
  def decodeTransform(t: org.apache.spark.sql.connector.expressions.Transform)
      : (String, String, Int) = {
    import org.apache.spark.sql.connector.expressions._
    def one(refs: Seq[NamedReference]): Option[String] =
      if (refs.length == 1 && refs.head.fieldNames.length == 1)
        Some(refs.head.fieldNames.head)
      else None
    t match {
      case IdentityTransform(r) => one(Seq(r)).map(("identity", _, 0))
        .getOrElse(("?", t.describe, 0))
      case YearsTransform(r) => one(Seq(r)).map(("year", _, 0))
        .getOrElse(("?", t.describe, 0))
      case MonthsTransform(r) => one(Seq(r)).map(("month", _, 0))
        .getOrElse(("?", t.describe, 0))
      case DaysTransform(r) => one(Seq(r)).map(("day", _, 0))
        .getOrElse(("?", t.describe, 0))
      case HoursTransform(r) => one(Seq(r)).map(("hour", _, 0))
        .getOrElse(("?", t.describe, 0))
      case b: BucketTransform =>
        one(b.columns.map(c => c: NamedReference))
          .map(("bucket", _, b.numBuckets.value.toString.toInt))
          .getOrElse(("?", t.describe, 0))
      case a: ApplyTransform if a.name.equalsIgnoreCase("truncate") =>
        // both argument orders appear in the wild: truncate(w, col)
        // (Iceberg DDL) and truncate(col, w)
        val widths = a.arguments.collect {
          case l: Literal[_] => l.value.toString.toInt }
        val refs = a.arguments.collect { case r: NamedReference => r }
        (widths.toSeq, one(refs.toSeq)) match {
          case (Seq(w), Some(c)) => ("truncate", c, w)
          case _ => ("?", t.describe, 0)
        }
      case _ => ("?", t.describe, 0)
    }
  }
}
