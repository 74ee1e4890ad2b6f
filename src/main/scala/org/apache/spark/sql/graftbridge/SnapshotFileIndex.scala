package org.apache.spark.sql.graftbridge

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{NoopCache, PartitionDirectory, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.types.StructType

/** A FileIndex fed entirely from Graft snapshot metadata: the snapshot
  * records every data file's path and size, so the scan needs NO
  * filesystem listing and NO per-file status round-trip — the property
  * that matters when a query plans against millions of files on object
  * storage (an InMemoryFileIndex stats each path on the driver at plan
  * time, once per query). Iceberg's SparkScan does the same thing with
  * manifest entries.
  *
  * Partition pruning has already happened upstream (StatsPruner over
  * snapshot stats + partition values), so this index is deliberately
  * partition-less: one PartitionDirectory holding exactly the selected
  * files.
  */
final class SnapshotFileIndex(
    spark: SparkSession,
    files: Seq[(String, Long)]) // (absolute path, size in bytes)
  extends PartitioningAwareFileIndex(spark, Map.empty, None, NoopCache) {

  private val statuses: Array[FileStatus] = files.map { case (p, len) =>
    // mtime/blocksize are irrelevant: split planning uses
    // spark.sql.files.maxPartitionBytes, and nothing recheck-stats these
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
  }.toArray

  override def rootPaths: Seq[Path] = statuses.map(_.getPath.getParent).distinct.toSeq

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses))

  override def allFiles(): Seq[FileStatus] = statuses.toIndexedSeq

  override def inputFiles: Array[String] = statuses.map(_.getPath.toString)

  override def sizeInBytes: Long = files.map(_._2).sum

  override def refresh(): Unit = ()

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def partitionSchema: StructType = StructType(Nil)

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m += s.getPath -> s)
    m
  }

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent)
}
