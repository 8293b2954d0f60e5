package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each suite object owns its `queries` (Spark plans) and `oracles`
  * (DuckDB-runnable ANSI SQL producing identical columns/rows); this
  * object is just the union.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Shipping(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ LogAnalytics.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      StreamingBatch.queries ++ Retrieval.queries ++ Training.queries

  /** DuckDB oracle SQL per query key (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ LogAnalytics.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      StreamingBatch.oracles ++ Retrieval.oracles ++ Training.oracles
}
