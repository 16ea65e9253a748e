package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §0.3/§3 and Verify/Bench. */
object SparkEntry {

  /** Every graded operator, one Q per SURVEY.md §3 inventory row. */
  def registry: Seq[Q] =
    operators.Relational.all ++
      operators.Aggregates.all ++
      operators.Windows.all ++
      operators.SortSet.all ++
      operators.EO.all ++
      operators.Llm.all ++
      operators.Corpus.all ++
      operators.LlmExtras.all ++
      operators.Multimodal.all ++
      operators.Skew.all ++
      operators.Quality.all ++
      operators.Graph.all ++
      operators.SqlSurface.all ++
      operators.Maintenance.all ++
      sources.SceneCatalog.all ++
      sources.GeoTiffScan.all ++
      functions.Scalars.all ++
      functions.Udfs.all ++
      streaming.StreamTwins.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.aggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §3. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
