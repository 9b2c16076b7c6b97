package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension-surface queries (SURVEY.md §2.11 X1–X6 + LLM-data-pipeline
  * ops) — declared separately so the core retail contract stays readable.
  * Filled in as each ext operator lands.
  */
object ExtQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
