package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator (SURVEY.md §2 IDs noted
  * at each definition site); `oracleSql` carries the DuckDB-equivalent ANSI
  * SQL for each hash-checked query. Every entry is hash-checked as of
  * round 18 — the last rows-only sketches (HLL approx-distinct, t-digest
  * approx-percentile) were replaced by deterministic KMV twins whose
  * estimates DuckDB re-derives bit-for-bit.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's `obter_top_10_indices` (main.py:149–157) transliterated
    * — see queries.RefQueries.flagshipTop10.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_flagship_top10")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RefQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.RelQueries.queries ++
      graft.etl.EtlQueries.queries ++
      graft.etl.Sampling.queries ++
      graft.etl.Profiler.queries ++
      graft.etl.Checks.queries ++
      graft.etl.SkewJoin.queries ++
      graft.queries.EventQueries.queries ++
      graft.text.TextOps.queries ++
      graft.text.CurationOps.queries ++
      graft.text.BpeTrainer.queries ++
      graft.text.Dedup.queries ++
      graft.text.SpanDedup.queries ++
      graft.text.CorpusPipeline.queries ++
      graft.text.LangId.queries ++
      graft.text.QualityModel.queries ++
      graft.vec.VectorOps.queries ++
      graft.graph.Components.queries ++
      graft.multimodal.Media.queries ++
      graft.sources.Sinks.queries ++
      graft.streaming.CorpusStreaming.queries ++
      graft.streaming.EventStreaming.queries ++
      graft.streaming.VectorStreaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.RefQueries.oracle ++
      graft.queries.JoinQueries.oracle ++
      graft.queries.RelQueries.oracle ++
      graft.etl.EtlQueries.oracle ++
      graft.etl.Sampling.oracle ++
      graft.etl.Profiler.oracle ++
      graft.etl.Checks.oracle ++
      graft.etl.SkewJoin.oracle ++
      graft.queries.EventQueries.oracle ++
      graft.text.TextOps.oracle ++
      graft.text.CurationOps.oracle ++
      graft.text.BpeTrainer.oracle ++
      graft.text.Dedup.oracle ++
      graft.text.SpanDedup.oracle ++
      graft.text.CorpusPipeline.oracle ++
      graft.text.LangId.oracle ++
      graft.text.QualityModel.oracle ++
      graft.vec.VectorOps.oracle ++
      graft.graph.Components.oracle ++
      graft.multimodal.Media.oracle ++
      graft.sources.Sinks.oracle ++
      graft.streaming.CorpusStreaming.oracle ++
      graft.streaming.EventStreaming.oracle ++
      graft.streaming.VectorStreaming.oracle
}
