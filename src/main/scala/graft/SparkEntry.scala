package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.queries("q13_join_lookup")(spark, "/root/testdata/sf0.001")
  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ graft.pipeline.PayrollQueries.queries ++
      ExtensionQueries.queries ++ AnalyticsQueries.queries ++
      FunctionQueries.queries ++ BenchQueries.queries ++
      CorpusQueries.queries ++ EtlQueries.queries ++
      RelationalQueries.queries ++ RankingQueries.queries ++
      LayoutQueries.queries ++ ClusterQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracleSql ++ graft.pipeline.PayrollQueries.oracleSql ++
      ExtensionQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      FunctionQueries.oracleSql ++ BenchQueries.oracleSql ++
      CorpusQueries.oracleSql ++ EtlQueries.oracleSql ++
      RelationalQueries.oracleSql ++ RankingQueries.oracleSql ++
      LayoutQueries.oracleSql ++ ClusterQueries.oracleSql
}
