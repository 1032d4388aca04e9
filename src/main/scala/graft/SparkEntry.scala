package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-package query modules; keys are globally unique and
  * stable across rounds.
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    etl.EtlQueries,
    ops.RelationalQueries,
    ops.ScalarQueries,
    ops.EventQueries,
    ops.GraphQueries,
    llm.TextQueries,
    llm.CorpusQueries,
    llm.DedupQueries,
    llm.QualityClassifier,
    llm.ZipfContracts,
    llm.SimilarityQueries,
    llm.Multimodal)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
