package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + oracle from the
  * per-module maps (graft.queries.*, graft.operators.*).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 shape (IQ-09): 3-way join + aggregation + top-k. */
  def entry(spark: SparkSession): DataFrame =
    queries("iq09_multijoin_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.PointCloudQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.TemporalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.PointCloudQueries.oracle ++
      graft.queries.OpsQueries.oracle ++
      graft.queries.StreamingQueries.oracle ++
      graft.queries.TemporalQueries.oracle
}
