package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live under graft.ops (one object per SURVEY §2 family);
  * DuckDB oracle texts live in graft.oracle.OracleSql.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): 3-way join revenue by segment on
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.JoinOps.c1_join_inner(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.ScanOps.queries ++ ops.FilterOps.queries ++ ops.JoinOps.queries ++
      ops.AggOps.queries ++ ops.SortSetOps.queries ++ ops.WindowOps.queries ++
      ops.FnOps.queries ++ ops.TextOps.queries ++ ops.SampleOps.queries ++
      ops.UdxOps.queries ++ ops.MultimodalOps.queries ++ ops.BpeOps.queries ++
      ops.UnigramOps.queries ++ ops.CurateOps.queries ++
      ops.RepetitionOps.queries ++ ops.RankOps.queries ++
      ops.SketchOps.queries ++ ops.DedupOps.queries ++
      ops.LangIdOps.queries ++ sources.WalOps.queries ++
      sources.NamespaceOps.queries ++ ops.BalancerOps.queries ++
      ops.ReplicaOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = oracle.OracleSql.all
}
