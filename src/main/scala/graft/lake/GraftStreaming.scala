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
    val present = versions.toSet
    // continuity: versions are DENSE (each commit is parent+1), so every
    // version in the window must still exist — a hole means expiry ate a
    // version whose appended rows this batch would silently drop
    // (including the window END, the classic WAL-replay-after-crash case)
    ((from + 1) to to).find(v => !present.contains(v)).foreach { v =>
      throw new IllegalStateException(
        s"snapshot v$v has been expired; the stream cannot compute an " +
          "incremental batch. Keep snapshots longer than the streaming " +
          "lag (expire_snapshots keep_last).")
    }
    versions.flatMap { v =>
      val snap = store.read(v)
      if (snap.operation == "append") {
        // files added by an append commit are exactly those stamped with
        // its commit sequence (SnapshotStore.commit is the single stamp
        // site) — no parent snapshot read, no full file-list diff, and a
        // sharded snapshot loads ONLY its own seq group's manifest
        // chunks: micro-batch planning is O(new files), whatever the
        // table size. Snapshots predating seq stamping (files default to
        // seq=0, which a stamped chain can never produce — versions
        // start at 1) fall back to the parent path-diff.
        val legacy =
          if (snap.manifests.nonEmpty) snap.manifests.exists(_.seq == 0L)
          else snap.files.exists(_.seq == 0L)
        if (!legacy) {
          if (snap.manifests.nonEmpty)
            SnapshotStore.loadChunks(store.tableDir,
              snap.manifests.filter(_.seq == v), store.io)
          else snap.files.filter(_.seq == v)
        } else {
          val parentPaths: Set[String] = snap.parentVersion match {
            case Some(p) if present.contains(p) || p <= from =>
              if (store.listVersions().contains(p))
                store.read(p).files.map(_.path).toSet
              else throw new IllegalStateException(
                s"parent snapshot v$p has been expired; the stream " +
                  "cannot compute an incremental batch for the pre-seq " +
                  s"snapshot v$v.")
            case Some(p) => throw new IllegalStateException(
              s"snapshot v$p has been expired; the stream cannot " +
                "compute an incremental batch.")
            case None => Set.empty
          }
          snap.files.filterNot(f => parentPaths.contains(f.path))
        }
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
