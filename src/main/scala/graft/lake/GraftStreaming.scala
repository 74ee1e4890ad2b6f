package graft.lake

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Incremental micro-batch streaming over the snapshot log
  * (SURVEY.md §2.8, §1.1 "Streams"): each committed snapshot is a stream
  * offset; a micro-batch reads exactly the data files ADDED between two
  * versions. This is the native `spark.readStream.table("graft.ns.t")`
  * path — the "Structured Streaming with Iceberg" integration the
  * reference promises (`SETUP_GUIDE_WIN.md:472`).
  *
  * Semantics: append-only tailing. Batches cover `(start, end]` append
  * commits; files introduced by rewrite commits (overwrite / delete /
  * merge / update / replace) are NOT emitted — they re-materialize
  * existing rows and would double-count. Iceberg's streaming read makes
  * the same choice (throws or skips on rewrites); we skip and keep
  * tailing appends.
  *
  * Scale notes: offsets are plain version numbers (restart-safe via the
  * checkpoint), partition planning is metadata-only (snapshot diff), and
  * each added file becomes one InputPartition read by the native
  * parquet-mr reader — no listing of the data directory, ever.
  */
final case class GraftOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

final class GraftMicroBatchStream(
    store: SnapshotStore,
    readSchema: StructType,
    checkpointLocation: String) extends MicroBatchStream {

  /** Streams start at the table's creation: the first batch replays all
    * rows appended since version 0 (i.e. the current content of an
    * append-only table). */
  override def initialOffset(): Offset = GraftOffset(0L)

  override def latestOffset(): Offset =
    GraftOffset(store.currentVersion().getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].version
    val to = end.asInstanceOf[GraftOffset].version
    if (to <= from) return Array.empty
    val versions = store.listVersions().filter(v => v > from && v <= to)
    versions.flatMap { v =>
      val snap = store.read(v)
      if (snap.operation == "append") {
        val parentPaths: Set[String] = snap.parentVersion match {
          case Some(p) =>
            if (store.listVersions().contains(p))
              store.read(p).files.map(_.path).toSet
            else throw new IllegalStateException(
              s"parent snapshot v$p has been expired; the stream cannot " +
                "compute an incremental batch. Keep snapshots longer than " +
                "the streaming lag (expire_snapshots keep_last).")
          case None => Set.empty
        }
        snap.files.filterNot(f => parentPaths.contains(f.path))
      } else Seq.empty // rewrite commits re-materialize rows: skip
    }.map(f =>
      GraftInputPartition(store.tableDir.resolve(f.path).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(readSchema.json,
      store.head().map(_.schema.json).getOrElse(readSchema.json))

  override def commit(end: Offset): Unit = () // snapshot log is immutable

  override def stop(): Unit = ()

  override def toString: String = s"GraftMicroBatchStream(${store.tableDir})"
}
