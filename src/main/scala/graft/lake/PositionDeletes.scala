package graft.lake

import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Merge-on-read position deletes (Iceberg v2 design; the reference's stack
  * advertises row-level deletes via Iceberg 1.4 — `README.md:124` "old ones
  * marked deleted"). A DELETE under `graft.delete-mode = merge-on-read`
  * writes a small parquet file of `(file_path STRING, pos BIGINT)` tuples
  * naming deleted rows by data-file path + 0-based row index, instead of
  * rewriting the data files (copy-on-write). Readers subtract the tuples
  * with an anti-join.
  *
  * Scale rationale: deleting 1k rows from a 100 TB table costs one KB-sized
  * delete file and a metadata commit; the COW alternative rewrites every
  * file containing a match. The read-side anti-join broadcasts the tuple
  * set while it stays small; `rewrite_deletes` compaction folds tuples back
  * into the data files when they accumulate.
  *
  * Join identity is the data file's NAME (UUID-unique within a table), not
  * its absolute path — `_metadata.file_path` returns a URI whose prefix
  * varies by filesystem, and the name is stable across both forms.
  */
object PositionDeletes {

  /** Column names inside a delete file (Iceberg's position-delete schema). */
  val FilePathCol = "file_path"
  val PosCol = "pos"

  /** Provenance column names attached to data reads for delete application
    * (prefixed to never collide with user columns). */
  val NameCol = "__gdel_name"
  val RowPosCol = "__gdel_pos"

  val tupleSchema: StructType = StructType(Seq(
    StructField(FilePathCol, StringType, nullable = false),
    StructField(PosCol, LongType, nullable = false)))

  def fileName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  /** Broadcast the anti-join's delete side while the tuple files stay small
    * (parquet bytes ≈ a few × in-memory) — one hash build instead of
    * shuffling the 100 TB data side. Past the threshold, fall back to the
    * planner's choice (sort-merge on the shuffled tuple set). */
  private val BroadcastMaxBytes = 32L * 1024 * 1024

  /** All tuples of `deleteFiles` as `(NameCol, RowPosCol)` — file paths
    * reduced to names for provenance joins. None when there are none. */
  def tuples(spark: SparkSession, store: SnapshotStore,
      deleteFiles: Seq[DeleteFile]): Option[DataFrame] =
    if (deleteFiles.isEmpty) None
    else {
      val paths = deleteFiles.map(f => store.tableDir.resolve(f.path).toString)
      val t = spark.read.schema(tupleSchema).parquet(paths: _*)
        .select(
          element_at(split(col(FilePathCol), "/"), -1).as(NameCol),
          col(PosCol).as(RowPosCol))
      Some(
        if (deleteFiles.map(_.sizeBytes).sum <= BroadcastMaxBytes) broadcast(t)
        else t)
    }

  /** Remove deleted rows from a data read that carries `NameCol`/`RowPosCol`
    * provenance columns (see [[SchemaNames.readLogicalWithProvenance]]).
    * Keeps the provenance columns — callers drop them after their last use. */
  def applyTo(spark: SparkSession, store: SnapshotStore,
      dataWithProvenance: DataFrame, deleteFiles: Seq[DeleteFile]): DataFrame =
    tuples(spark, store, deleteFiles) match {
      case None => dataWithProvenance
      case Some(t) =>
        dataWithProvenance.join(t,
          dataWithProvenance(NameCol) === t(NameCol) &&
            dataWithProvenance(RowPosCol) === t(RowPosCol),
          "left_anti")
    }

  /** Stage a `(file_path, pos)` tuple DataFrame as new delete files and
    * move them into `data/`. Tuples are globally sorted by (file, pos) so
    * each delete file covers a narrow file range (footer stats then let a
    * future per-file pushdown prune them). Returns the committed entries
    * (empty when the DataFrame is empty). */
  def writeDeleteFiles(spark: SparkSession, store: SnapshotStore,
      tuples: DataFrame): Seq[DeleteFile] = {
    val staging = store.tableDir.resolve(s".staging-del-${UUID.randomUUID()}")
    try {
      tuples
        .select(col(FilePathCol).cast(StringType), col(PosCol).cast(LongType))
        .sort(FilePathCol, PosCol)
        .write.parquet(staging.toString)
      val staged = Files.walk(staging).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq
      staged.flatMap { p =>
        val (cnt, _) = FooterStats.read(p, Seq.empty)
        if (cnt == 0) None
        else {
          val newName = s"${UUID.randomUUID()}-deletes.parquet"
          val target = store.dataDir.resolve(newName)
          val size = Files.size(p)
          Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
          Some(DeleteFile(s"data/$newName", cnt, size))
        }
      }
    } finally {
      if (Files.exists(staging)) {
        Files.walk(staging).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
      }
    }
  }

  /** Rewrite `deleteFiles` keeping only tuples that reference a surviving
    * data file — called by commits that REMOVE data files (COW rewrites,
    * compaction) so no dangling tuples accumulate and
    * `Snapshot.totalRows`'s subtraction stays exact. Cheap by construction:
    * delete files are small (else `rewrite_deletes` should have folded them
    * in). Returns the replacement entries; the caller commits them. */
  def retain(spark: SparkSession, store: SnapshotStore,
      deleteFiles: Seq[DeleteFile],
      survivingFiles: Seq[DataFile]): Seq[DeleteFile] = {
    if (deleteFiles.isEmpty) return Seq.empty
    val surviving = survivingFiles.map(_.path).toSet
    val paths = deleteFiles.map(f => store.tableDir.resolve(f.path).toString)
    val kept = spark.read.schema(tupleSchema).parquet(paths: _*)
      .filter(col(FilePathCol).isin(surviving.toSeq: _*))
    writeDeleteFiles(spark, store, kept)
  }

  /** Per-data-file deleted positions (sorted ascending), keyed by file
    * NAME, restricted to `files` — feeds the COW rewrite reader
    * (GraftPartitionReader skips these row indexes). Driver-side collect:
    * bounded by the tuple count of the PRUNED file set; a deployment where
    * this is large should run `rewrite_deletes` first (the rewrite itself
    * stays distributed either way — only the positions index is driver
    * resident, same as Iceberg's delete-file index in the planner). */
  def positionsByFileName(spark: SparkSession, store: SnapshotStore,
      deleteFiles: Seq[DeleteFile],
      files: Seq[DataFile]): Map[String, Array[Long]] = {
    if (deleteFiles.isEmpty || files.isEmpty) return Map.empty
    val wanted = files.map(f => fileName(f.path)).toSet
    val paths = deleteFiles.map(f => store.tableDir.resolve(f.path).toString)
    spark.read.schema(tupleSchema).parquet(paths: _*)
      .select(
        element_at(split(col(FilePathCol), "/"), -1).as(NameCol),
        col(PosCol))
      .filter(col(NameCol).isin(wanted.toSeq: _*))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).distinct.sorted).toMap
  }
}
