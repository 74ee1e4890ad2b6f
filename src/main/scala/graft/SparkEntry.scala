package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the declared query packs (one `Q` per implemented operator
  * from SURVEY.md §2). Each `Q` with an oracle gets hash-compared against
  * DuckDB running the twin SQL on the same parquet; oracle-less ops get the
  * weaker rows-only check plus ScalaTest property coverage.
  */
object SparkEntry {

  val packs: Seq[Q] =
    Relational.all ++ Analytics.all ++ TextOps.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ LakeOps.all ++ StreamingOps.all ++
      Sources.all ++ Skew.all ++ TypedOps.all ++ AsOf.all ++ Ranges.all ++
      Pipeline.all ++ Selection.all ++ Retrieval.all ++ CorpusOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q3-shaped revenue/shipping-priority join-agg (SURVEY.md §7.1). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3ShippingPriority.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
