package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries, CurationQueries, ExtendedQueries, LlmQueries, PipelineQueries, Q, RlhfQueries, SinkQueries, SyncQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 and TESTDATA.md.
  *
  * `queries` is the operator inventory of SURVEY §2 re-expressed over the
  * driver's testdata tables: the reference's sync dataflow operators
  * (LWW merge, guarded upsert, anti-join backfill, set-diff delete,
  * explode-normalize, JSON projection, prefix dispatch, signatures), the
  * relational surface its Postgres mirror exposes (joins, aggregates,
  * rollup/pivot, windows, top-k, set ops), and the LLM-pipeline operators
  * (dedup exact/key/Jaccard/MinHash/SimHash, cosine KNN + LSH ANN, text
  * analysis, multimodal plumbing).
  */
object SparkEntry {

  val inventory: Seq[Q] =
    AnalyticsQueries.all ++ SyncQueries.all ++ LlmQueries.all ++
      ExtendedQueries.all ++ PipelineQueries.all ++ CurationQueries.all ++
      RlhfQueries.all ++ SinkQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full join pipeline (5-table star join → agg → sort). */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for approximate/sketch operators
    * (MinHash bands, SimHash, LSH ANN) → driver records rows-only. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
