package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test bridge into MediaIngest's package-private candidate machinery
  * (plan-shape pins live in graft-package specs). */
object MediaIngestBridge {
  def bands(spark: SparkSession, media: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val ph = ColumnBridge.column(
      graft.functions.DHash64(ColumnBridge.expression(col("payload"))))
    MediaIngest.phashBands(
      media.select(col("media_id"), ph.as("phash")))
  }

  def candidates(index: DataFrame, batchBands: DataFrame): DataFrame =
    MediaIngest.corpusMediaCandidates(index, batchBands)
}
