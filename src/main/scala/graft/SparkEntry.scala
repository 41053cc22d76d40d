package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's public query surface: every operator from SURVEY.md §2
  * (reference parity + relational completions + LLM-pipeline extensions)
  * is one entry in `queries`, with DuckDB oracle SQL in `oracleSql` where
  * the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** All registered queries, grouped by suite. */
  def registry: Seq[Q] =
    _root_.graft.queries.Core.all ++
      _root_.graft.queries.MapReduceQueries.all ++
      _root_.graft.queries.Dedup.all ++
      _root_.graft.queries.Similarity.all ++
      _root_.graft.queries.TextAnalysis.all ++
      _root_.graft.queries.Sampling.all ++
      _root_.graft.queries.Multimodal.all ++
      _root_.graft.queries.EventWindows.all ++
      _root_.graft.queries.Behavior.all ++
      _root_.graft.queries.Relational2.all ++
      _root_.graft.queries.Profiling.all ++
      _root_.graft.queries.Sketches.all ++
      _root_.graft.sources.Sources.all ++
      _root_.graft.operators.CleanCorpus.all ++
      _root_.graft.operators.SequencePacking.all ++
      _root_.graft.operators.GlobalOrder.all ++
      _root_.graft.operators.PrefixScan.all ++
      _root_.graft.operators.MatrixScan.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own golden workload: character frequency count
    * (SampleClient.cpp:32-66) over documents.text.
    */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Core.charCount.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
