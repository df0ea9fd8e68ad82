package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from the per-domain operator modules
  * under `graft.ops` (and, as they land, `graft.ml`, `graft.dedup`,
  * `graft.text`, `graft.search`, `graft.streaming`). Each module
  * contributes `QueryDef`s carrying both the Spark program and (when
  * SQL-expressible) the DuckDB oracle.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    ops.Statistics.defs ++ ops.Relational.defs ++ ops.Scalars.defs ++
      ops.Analytics.defs ++ ops.Nested.defs ++ ops.TopK.defs ++
      ops.Temporal.defs ++ ops.RangeOps.defs ++ ops.Cdc.defs ++
      ops.FuzzyJoin.defs ++
      ops.Layout.defs ++ ops.Profiling.defs ++ graph.PageRank.defs ++
      graph.Triangles.defs ++ graph.KCore.defs ++ graph.Communities.defs ++
      ml.Recommend.defs ++ ml.QualityModel.defs ++ ml.Sampling.defs ++
      dedup.Dedup.defs ++ dedup.SetSimJoin.defs ++
      search.Ann.defs ++ search.Projection.defs ++ search.Pq.defs ++
      search.Embeddings.defs ++
      text.TextAnalysis.defs ++ text.Vocab.defs ++ text.Retrieval.defs ++
      text.Bpe.defs ++
      streaming.Rescoring.defs ++ mm.Multimodal.defs ++
      mm.MediaDedup.defs ++ mm.VideoDedup.defs ++ pipeline.Curation.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.joinFiveWay.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
