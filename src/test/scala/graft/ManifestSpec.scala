package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Sharded snapshot metadata (round-3): above SnapshotStore.InlineMaxFiles
  * the file list pages out of `v<N>.json` into immutable manifest chunks,
  * commits re-point unchanged chunks instead of rewriting the world, and
  * expiry garbage-collects chunks no surviving snapshot references. */
class ManifestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-mani-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.mani", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.mani.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS mani.t")
  }

  private def store(t: String) = new SnapshotStore(Paths.get(wh, "t", t))

  private def bigInsert(table: String, n: Long, parts: Int): Unit = {
    import spark.implicits._
    spark.range(n).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(parts)
      .writeTo(s"mani.t.$table").append()
  }

  test("above the threshold the file list pages out to manifest chunks") {
    sql("CREATE TABLE mani.t.big (id BIGINT, v STRING) USING iceberg")
    bigInsert("big", 1000, 100) // 100 files > InlineMaxFiles
    val st = store("big")
    val head = st.head().get
    assert(head.files.size > SnapshotStore.InlineMaxFiles)
    assert(head.manifests.nonEmpty, "expected a sharded snapshot")
    // on disk: v2.json holds refs, not file entries
    val raw = Files.readString(
      Paths.get(wh, "t", "big", "metadata", s"v${head.version}.json"))
    assert(raw.contains("\"manifests\""))
    assert(!raw.contains("\"partitionValues\""),
      "inline file entries left in a sharded snapshot")
    // chunks exist and the ref rollups match the materialized list
    head.manifests.foreach { r =>
      assert(Files.exists(Paths.get(wh, "t", "big").resolve(r.path)), r.path)
    }
    assert(head.manifests.map(_.fileCount).sum == head.files.size)
    assert(head.manifests.map(_.rowCount).sum == 1000L)
    // end-to-end: scan + pruning still work over the assembled list
    assert(sql("SELECT count(*) FROM mani.t.big").collect()(0).getLong(0) == 1000L)
    assert(sql("SELECT count(*) FROM mani.t.big WHERE id < 10")
      .collect()(0).getLong(0) == 10L)
  }

  test("an append re-points unchanged chunks and writes only its own") {
    sql("CREATE TABLE mani.t.reuse (id BIGINT, v STRING) USING iceberg")
    bigInsert("reuse", 1000, 100)
    val st = store("reuse")
    val v2 = st.head().get
    assert(v2.manifests.nonEmpty)
    bigInsert("reuse", 50, 10)
    val v3 = st.head().get
    val v2Paths = v2.manifests.map(_.path).toSet
    val v3Paths = v3.manifests.map(_.path).toSet
    assert(v2Paths.subsetOf(v3Paths),
      s"append rewrote parent chunks: ${v2Paths -- v3Paths}")
    assert((v3Paths -- v2Paths).nonEmpty, "append added no chunk of its own")
    assert(v3.files.size == v2.files.size + 10)
    // time travel through the shared chunks
    val old = sql(s"SELECT count(*) FROM mani.t.reuse VERSION AS OF ${v2.version}")
      .collect()(0).getLong(0)
    assert(old == 1000L)
    assert(sql("SELECT count(*) FROM mani.t.reuse").collect()(0).getLong(0) == 1050L)
  }

  test("chunk bounds from real writes prune the manifest list under a filter") {
    sql("CREATE TABLE mani.t.bnd (id BIGINT, v STRING) USING iceberg")
    bigInsert("bnd", 1000, 100)               // ids [0, 999], chunk of seq 2
    import spark.implicits._
    spark.range(5000, 6000).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(100)
      .writeTo("mani.t.bnd").append()         // ids [5000, 5999], chunk of seq 3
    val head = store("bnd").head().get
    assert(head.manifests.size >= 2)
    assert(head.manifests.forall(_.bounds.get("id").exists(st =>
      st.min.isDefined && st.max.isDefined)))
    // manifest-list pruning: the filter's id range rules out seq-2 chunks
    // entirely — fewer files are even CONSIDERED, none of them match
    val phys = Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 5500L))
    val considered = store("bnd").filesForScan(head, phys)
    assert(considered.size < head.fileCount)
    assert(considered.forall(_.stats("id").max.exists(_.toLong >= 5500L)))
    // and results stay correct through the full read path
    assert(sql("SELECT count(*) FROM mani.t.bnd WHERE id >= 5500")
      .collect()(0).getLong(0) == 500L)
    assert(sql("SELECT count(*) FROM mani.t.bnd").collect()(0).getLong(0) == 2000L)
  }

  test("t.manifests exposes the chunk refs with rollups and bounds") {
    sql("CREATE TABLE mani.t.mf (id BIGINT, v STRING) USING iceberg")
    bigInsert("mf", 1000, 100)
    val rows = sql("SELECT * FROM mani.t.mf.manifests ORDER BY path").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum == 100L) // file_count rollup
    assert(rows.map(_.getLong(3)).sum == 1000L) // record_count rollup
    val bounds = rows.head.getMap[String, String](5)
    assert(bounds.keys.exists(_ == "id"))
  }

  test("metadata-only aggregates answer from chunk-bound rollups on a sharded table") {
    sql("CREATE TABLE mani.t.agg (id BIGINT, v STRING) USING iceberg")
    bigInsert("agg", 1000, 100)
    val p = sql("SELECT min(id), max(id), count(id), count(*) FROM mani.t.agg")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GraftMetadataAggScan"), s"not pushed:\n$p")
    val r = sql("SELECT min(id), max(id), count(id), count(*) FROM mani.t.agg")
      .collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 999L &&
      r.getLong(2) == 1000L && r.getLong(3) == 1000L)
  }

  test("streaming tail over a sharded table plans batches from seq-group chunks") {
    sql("CREATE TABLE mani.t.st (id BIGINT, v STRING) USING iceberg")
    bigInsert("st", 1000, 100) // sharded: the first batch replays via chunks
    val seen = new java.util.concurrent.atomic.AtomicLong
    val ck = Files.createTempDirectory("mani-ck").toString
    val q = spark.readStream.table("mani.t.st")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(b.count()); ()
      }
      .option("checkpointLocation", ck).start()
    q.processAllAvailable()
    assert(seen.get == 1000L)
    // the incremental batch plans from the NEW append's seq group only —
    // no parent snapshot read, no full file-list diff
    bigInsert("st", 50, 10)
    q.processAllAvailable()
    assert(seen.get == 1050L)
    q.stop()
  }

  test("branches seed by reference; expiry frees unreferenced chunks") {
    sql("CREATE TABLE mani.t.gc (id BIGINT, v STRING) USING iceberg")
    bigInsert("gc", 1000, 100)
    val st = store("gc")
    val v2 = st.head().get

    Maintenance.createBranch(st, "audit")
    val bHead = st.branchStore("audit").head().get
    assert(bHead.manifests.map(_.path) == v2.manifests.map(_.path),
      "branch did not share the main chain's chunks")

    // replace everything twice so v2's chunks become expirable
    bigInsert("gc", 800, 80)
    sql("INSERT OVERWRITE mani.t.gc SELECT id, concat('w', id) FROM range(700)")
    Maintenance.dropBranch(st, "audit")
    val expired = Maintenance.expireSnapshots(st, keepLast = 1)
    assert(expired.nonEmpty)
    val live = st.head().get
    val liveChunks = live.manifests.map(_.path).toSet
    v2.manifests.foreach { r =>
      assert(!Files.exists(Paths.get(wh, "t", "gc").resolve(r.path)),
        s"expired chunk survived: ${r.path}")
    }
    liveChunks.foreach { p =>
      assert(Files.exists(Paths.get(wh, "t", "gc").resolve(p)),
        s"live chunk deleted: $p")
    }
    assert(sql("SELECT count(*) FROM mani.t.gc").collect()(0).getLong(0) == 700L)
  }
}
