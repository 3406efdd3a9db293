package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One thematic group of SURVEY.md §2 operators: named queries plus their
  * DuckDB oracle SQL (keys of [[oracle]] must be a subset of [[queries]]). */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
