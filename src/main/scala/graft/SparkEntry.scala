package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared query family in `graft.ops`. Each query name
  * maps to a DataFrame program `(spark, sfDir) => DataFrame`; when the
  * semantics are ANSI-SQL-expressible the same name appears in
  * `oracleSql` with a DuckDB-runnable equivalent (identical column
  * aliases + deterministic ORDER BY on both sides).
  */
object SparkEntry {

  private def allDefs: Map[String, QueryDef] =
    ops.CoreQueries.defs ++
      ops.JoinQueries.defs ++
      ops.SetQueries.defs ++
      ops.TextQueries.defs ++
      ops.CurationQueries.defs ++
      ops.DedupQueries.defs ++
      ops.SimilarityQueries.defs ++
      ops.ClusteringQueries.defs ++
      ops.EventQueries.defs ++
      ops.StreamQueries.defs ++
      ops.MultimodalQueries.defs ++
      ops.FunctionQueries.defs ++
      ops.FormatQueries.defs ++
      ops.TemporalJoinQueries.defs ++
      ops.SqlQueries.defs ++
      ops.GraphQueries.defs ++
      ops.PrepQueries.defs ++
      ops.MaintenanceQueries.defs ++
      ops.SketchQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_sum_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, qd) => name -> qd.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, QueryDef(_, Some(sql))) => name -> sql }
}
