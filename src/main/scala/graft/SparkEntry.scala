package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query corpus lives in graft.queries.*; each domain object contributes
  * QueryDefs (engine query + optional DuckDB oracle SQL). */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ CoverageQueries.defs ++ AggregationQueries.defs ++
      ScalarQueries.defs ++ ComplexTypeQueries.defs ++ PipelineQueries.defs ++
      StreamingQueries.defs ++ MiscQueries.defs ++ TpchQueries.defs ++ TpchQueries2.defs ++
      TpcdsQueries.defs ++ TpcdsQueries2.defs ++ TpcdsQueries3.defs ++ TpcdsQueries4.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql.trim }.toMap
}
