package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2 + the
  * large-scale training-data operators); `oracleSql` carries the
  * DuckDB-equivalent SQL for every query whose semantics are
  * SQL-expressible. Column names are aliased identically on both
  * sides — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q5PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.DataOps.queries ++
      graft.queries.Crawl.queries ++
      graft.queries.Events.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check (non-SQL-expressible ops). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.DataOps.oracleSql ++
      graft.queries.Crawl.oracleSql ++
      graft.queries.Events.oracleSql
}
