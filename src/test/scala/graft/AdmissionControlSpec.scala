package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Streaming admission control (SupportsAdmissionControl): a stream over
  * a lake table with a backlog drains it in bounded per-trigger batches
  * under `maxFilesPerTrigger` / `maxRowsPerTrigger`, instead of planning
  * one batch with every file ever appended — the restart-against-a-100TB-
  * table shape. Offset math is unit-tested against a synthetic store
  * (metadata only); the option plumbing end-to-end through
  * `readStream.table(...).option(...)` with Trigger.AvailableNow. */
class AdmissionControlSpec extends AnyFunSuite {

  private val schemaJson = StructType(Seq(StructField("id", LongType))).json

  /** versions 1..n: appends of `filesPer` files × `rowsPer` rows each. */
  private def buildStore(appends: Int, filesPer: Int, rowsPer: Long)
      : SnapshotStore = {
    val store = new SnapshotStore(
      Files.createTempDirectory("graft-adm").resolve("t"))
    store.init()
    store.commit(_ => Snapshot(0, None, 0, "create", schemaJson,
      Seq.empty, Map.empty, Seq.empty, Map.empty))
    (0 until appends).foreach { c =>
      val fs = (0 until filesPer).map(i => DataFile(
        s"data/f-$c-$i.parquet", rowCount = rowsPer, sizeBytes = 1024,
        partitionValues = Map.empty, stats = Map.empty,
        seq = Snapshot.UnassignedSeq))
      store.commitAppend(fs) { (p, st) =>
        p.copy(timestampMs = c, operation = "append")
      }
    }
    store
  }

  private def stream(store: SnapshotStore) = new GraftMicroBatchStream(
    store, StructType(Seq(StructField("id", LongType))), "unused-ck")

  private def latest(s: GraftMicroBatchStream, from: Long, l: ReadLimit): Long =
    s.latestOffset(GraftOffset(from), l).asInstanceOf[GraftOffset].version

  test("maxFiles caps the offset range at commit granularity") {
    val store = buildStore(appends = 5, filesPer = 3, rowsPer = 10)
    val s = stream(store)
    // create=v1, appends v2..v6; 3 files per append
    assert(latest(s, 0, ReadLimit.maxFiles(3)) == 2)
    assert(latest(s, 2, ReadLimit.maxFiles(6)) == 4)
    assert(latest(s, 2, ReadLimit.maxFiles(7)) == 4) // 3rd append won't fit
    assert(latest(s, 0, ReadLimit.allAvailable()) == 6)
    assert(latest(s, 6, ReadLimit.maxFiles(3)) == 6) // caught up: no-op
  }

  test("maxRows caps, and an oversized single commit still advances") {
    val store = buildStore(appends = 3, filesPer = 2, rowsPer = 100)
    val s = stream(store)
    assert(latest(s, 0, ReadLimit.maxRows(200)) == 2)  // one append (200 rows)
    // the zero-row create commit fits under any cap: the first batch ends
    // there (empty but advancing), and the oversized append then forms its
    // own single-commit batch — progress without ever splitting a commit
    assert(latest(s, 0, ReadLimit.maxRows(50)) == 1)
    assert(latest(s, 1, ReadLimit.maxRows(50)) == 2)
    assert(latest(s, 2, ReadLimit.maxRows(400)) == 4)  // exactly two appends
    // composite: strictest of files/rows wins
    assert(latest(s, 0, ReadLimit.compositeLimit(Array(
      ReadLimit.maxFiles(10), ReadLimit.maxRows(200)))) == 2)
  }

  test("sharded snapshots cost batches from seq-group manifest rollups") {
    // 70 files/append > InlineMaxFiles(64): snapshots page out to
    // manifest chunks, and the cap must be computed from the per-seq
    // rollups without materializing any file list
    val store = buildStore(appends = 3, filesPer = 70, rowsPer = 10)
    assert(store.head().get.manifests.nonEmpty, "expected a sharded table")
    val s = stream(store)
    assert(latest(s, 0, ReadLimit.maxFiles(70)) == 2)
    assert(latest(s, 2, ReadLimit.maxFiles(140)) == 4)
    assert(latest(s, 0, ReadLimit.maxRows(700)) == 2)
    assert(latest(s, 0, ReadLimit.allAvailable()) == 4)
  }

  test("an EMPTY stamped append costs nothing (only legacy over-costs)") {
    val store = buildStore(appends = 2, filesPer = 2, rowsPer = 100)
    // v4: an append that added zero files (INSERT matching no rows)
    store.commitAppend(Seq.empty) { (p, st) =>
      p.copy(timestampMs = 9, operation = "append")
    }
    val s = stream(store)
    // window (0..4] under a 2-file cap: v1(create)+v2 fill the cap; the
    // NEXT trigger from v2 must take v3 AND the free empty v4 together —
    // an empty commit must never close a batch on its own
    assert(latest(s, 0, ReadLimit.maxFiles(2)) == 2)
    assert(latest(s, 2, ReadLimit.maxFiles(2)) == 4)
  }

  test("backlog drains in bounded AvailableNow batches via readStream options") {
    val spark = SparkSpec.session
    val wh = Files.createTempDirectory("graft-adm-wh").toString
    spark.conf.set("spark.sql.catalog.admspec",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.admspec.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS admspec.db")
    spark.sql("CREATE TABLE admspec.db.ev (id INT) USING graft")
    (0 until 4).foreach(i =>
      spark.sql(s"INSERT INTO admspec.db.ev VALUES (${2 * i}), (${2 * i + 1})"))
    val ck = Files.createTempDirectory("graft-adm-ck").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .table("admspec.db.ev")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          batches.incrementAndGet()
          b.select("id").collect().foreach(r => seen.add(r.getInt(0)))
        }
        ()
      }
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    import scala.jdk.CollectionConverters._
    assert(seen.iterator().asScala.toSet == (0 until 8).toSet,
      "the capped drain must still deliver every row exactly once")
    // 4 append commits, each its own file/commit -> 4 bounded batches
    assert(batches.get() >= 4,
      s"expected the backlog split into >=4 batches, got ${batches.get()}")
  }
}
