package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-area modules; keys must be unique.
  */
object SparkEntry {
  private def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.EventTimeParity,
    operators.FunctionsSuite,
    operators.AggregatesSuite,
    operators.TextPipelineSuite,
    operators.SimilaritySuite,
    operators.MiscParity,
    operators.ExtraParity,
    operators.MoreParity,
    operators.DsParity,
    operators.DsParityExt,
    operators.DsParityExt2,
    operators.DsParityExt3,
    operators.JdbcParity,
    operators.LogParity,
    operators.PipelineExt,
    operators.PipelineExt2,
    operators.PipelineExt3,
    operators.PipelineExt4,
    operators.PipelineExt5,
    operators.CdcParity,
    operators.TpchGate
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
