package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test bridge into private[operators] graph machinery for specs living
  * outside the operators package (IngestNearDupSpec's equivalence pin). */
object PipelineBridge {
  def cc(s: SparkSession, nodes: DataFrame, edges: DataFrame): DataFrame =
    Pipeline.connectedComponents(s, nodes, edges)

  def dupClasses(docs: DataFrame): DataFrame = Dedup.dupClasses(docs)

  def repDocsOf(docs: DataFrame, members: DataFrame): DataFrame =
    Dedup.repDocsOf(docs, members)
}
