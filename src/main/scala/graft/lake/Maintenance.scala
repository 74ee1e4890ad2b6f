package graft.lake

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Table maintenance (SURVEY.md §2.2 D13, §2.11.1): the reference exposes
  * compaction as `ALTER TABLE … COMPACT` (`warehouse_helpers.py:142-146`) —
  * invalid Iceberg SQL; the real capability (`README.md:141-142`
  * "Compact small files", "Expire old snapshots") is implemented here as a
  * Scala API, callable from jobs.
  *
  * Scale note: `compact` rewrites per partition-value group, so at 100 TB
  * each partition compacts independently (and the rewrite could be
  * restricted to partitions with many small files); the commit replaces
  * only the rewritten files' entries.
  */
object Maintenance {

  /** Rewrite small data files into bigger ones (one file per partition
    * value per `targetFileCount` group); commits a `replace` snapshot with
    * identical row content. Returns the new snapshot. */
  def compact(
      spark: SparkSession,
      store: SnapshotStore,
      smallFileThresholdBytes: Long = 64L * 1024 * 1024): Snapshot = {
    val head = store.head().getOrElse(
      throw new IllegalStateException(s"no table at ${store.tableDir}"))
    val small = head.files.filter(_.sizeBytes < smallFileThresholdBytes)
    if (small.size <= 1) return head // nothing to gain
    val keep = head.files.filterNot(small.contains)
    val paths = small.map(f => store.tableDir.resolve(f.path).toString)
    val df = SchemaNames.readLogical(spark, head.schema, paths)
      .coalesce(math.max(1, small.map(_.sizeBytes).sum / smallFileThresholdBytes).toInt)
    val rewritten = GraftWriter.writeFiles(spark, store, head.schema,
      head.partitionSpec, df)
    store.commit { prev =>
      val p = prev.getOrElse(head)
      require(p.version == head.version,
        "concurrent commit during compaction; retry")
      p.copy(
        timestampMs = System.currentTimeMillis(),
        operation = "replace",
        files = keep ++ rewritten,
        summary = Map(
          "compacted-files" -> small.size.toString,
          "new-files" -> rewritten.size.toString,
          "total-records" -> (keep ++ rewritten).map(_.rowCount).sum.toString))
    }
  }

  /** Drop snapshot metadata older than `keepLast` versions and delete data
    * files no remaining snapshot references (`README.md:142` "Expire old
    * snapshots you don't need"). Time travel to expired versions stops
    * working — by design. Tag-pinned versions are NEVER expired: a tag's
    * whole purpose is outliving retention (same rule as Iceberg refs). */
  def expireSnapshots(store: SnapshotStore, keepLast: Int = 3): Seq[Long] = {
    val versions = store.listVersions()
    if (versions.size <= keepLast) return Seq.empty
    val pinned = store.refs().values.toSet
    val (expirable, keepTail) = versions.splitAt(versions.size - keepLast)
    val (tagged, expire) = expirable.partition(pinned.contains)
    val keep = tagged ++ keepTail
    val referenced: Set[String] =
      keep.map(store.read).flatMap(_.files.map(_.path)).toSet
    val expiredRefs: Set[String] =
      expire.map(store.read).flatMap(_.files.map(_.path)).toSet
    (expiredRefs -- referenced).foreach { rel =>
      Files.deleteIfExists(store.tableDir.resolve(rel))
    }
    expire.foreach { v =>
      Files.deleteIfExists(store.tableDir.resolve("metadata").resolve(s"v$v.json"))
    }
    expire
  }

  /** Remove data files not referenced by ANY snapshot (failed writes,
    * crashed commits). */
  def removeOrphanFiles(store: SnapshotStore): Seq[String] = {
    val referenced = store.listVersions().map(store.read)
      .flatMap(_.files.map(_.path)).toSet
    if (!Files.isDirectory(store.dataDir)) return Seq.empty
    val orphans = Files.list(store.dataDir).iterator().asScala
      .filter(p => !referenced.contains(s"data/${p.getFileName}"))
      .toSeq
    orphans.foreach(Files.deleteIfExists(_))
    orphans.map(_.getFileName.toString)
  }
}
