package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.cdc.{Envelopes, Pipeline}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2 inventory +
  * north-star extensions) to a DataFrame builder over a scale-factor
  * directory; `oracleSql` holds the DuckDB-equivalent SQL the driver
  * hash-compares against on the same parquet tables.
  */
object SparkEntry {

  /** Flagship query: the full reference pipeline (parse → filter → route →
    * passthrough) on sf0.001. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.route(Envelopes.fromEvents(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ MultimodalQueries.queries ++ WindowQueries.queries ++
      RelationalQueries.queries ++ AdvancedQueries.queries ++
      CurationQueries.queries ++ AnalyticsQueries.queries ++
      SourceQueries.queries ++ RetrievalQueries.queries

  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      TextQueries.oracles ++ MultimodalQueries.oracles ++ WindowQueries.oracles ++
      RelationalQueries.oracles ++ AdvancedQueries.oracles ++
      CurationQueries.oracles ++ AnalyticsQueries.oracles ++
      SourceQueries.oracles ++ RetrievalQueries.oracles
}
