package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every graded query from the per-area modules under
  * `graft.queries`. Each module returns `Seq[Q]`; a Q pairs the Spark
  * plan with its DuckDB oracle SQL (or None for non-SQL-expressible
  * operators, which the driver checks rows-only).
  */
object SparkEntry {

  def allQueries: Seq[Q] =
    _root_.graft.queries.Relational.queries ++
      _root_.graft.queries.Pipeline.queries ++
      _root_.graft.queries.Multimodal.queries ++
      _root_.graft.queries.Advanced.queries ++
      _root_.graft.queries.Warehouse.queries ++
      _root_.graft.queries.Streaming.queries ++
      _root_.graft.queries.Service.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
