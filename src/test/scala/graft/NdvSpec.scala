package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Per-file HLL NDV sketches (`graft.ndv-columns`): distinct counts from
  * metadata only, mergeable across files, surfaced through `t.stats` and
  * the optimizer's columnStats. */
class NdvSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-ndv-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.ndv", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.ndv.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS ndv.t")
    s
  }

  test("t.stats NDV from merged sketches is within 5% of exact") {
    spark.sql("""CREATE TABLE ndv.t.ids (k BIGINT, v STRING) USING iceberg
                 TBLPROPERTIES ('graft.ndv-columns' = 'k,v')""")
    // 4 appends with overlapping key ranges → per-file sketches must MERGE
    // correctly (naive per-file sums would give ~2x the truth)
    (0 until 4).foreach { b =>
      spark.sql(s"""INSERT INTO ndv.t.ids
                    SELECT id + ${b * 2500}, concat('v', CAST(id % 700 AS STRING))
                    FROM range(0, 5000)""")
    }
    val exact = spark.sql(
      "SELECT count(DISTINCT k), count(DISTINCT v) FROM ndv.t.ids").head()
    val stats = spark.sql(
      "SELECT column, ndv_estimate FROM ndv.t.ids.stats WHERE column IN ('k','v')")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("k" -> exact.getLong(0), "v" -> exact.getLong(1)).foreach {
      case (c, truth) =>
        val est = stats(c)
        assert(math.abs(est - truth).toDouble / truth < 0.05,
          s"$c: estimate $est vs exact $truth")
    }
    // min/max/null_count also surface
    val kRow = spark.sql(
      "SELECT min, max, null_count FROM ndv.t.ids.stats WHERE column = 'k'").head()
    assert(kRow.getString(0) == "0")
    assert(kRow.getLong(2) == 0L)
  }

  test("optimizer columnStats report the merged distinct count") {
    val t = spark.table("ndv.t.ids")
    val store = new SnapshotStore(Paths.get(wh, "t", "ids"))
    val cs = NdvStats.columnStats(store.head().get)
    assert(cs.size() >= 2)
    val k = cs.entrySet().iterator().next()
    assert(cs.values().iterator().next().distinctCount().isPresent)
    assert(t.count() == 20000) // and the data itself still reads fine
  }

  test("unsupported ndv column type fails the write loudly") {
    spark.sql("""CREATE TABLE ndv.t.bad (x DOUBLE) USING iceberg
                 TBLPROPERTIES ('graft.ndv-columns' = 'x')""")
    intercept[Exception] {
      spark.sql("INSERT INTO ndv.t.bad VALUES (1.0)")
    }
  }

  test("CALL analyze backfills sketches for pre-property files") {
    spark.sql("CREATE TABLE ndv.t.late (k BIGINT, v STRING) USING iceberg")
    spark.sql("INSERT INTO ndv.t.late SELECT id, concat('x', CAST(id AS STRING)) FROM range(0, 1000)")
    spark.sql("INSERT INTO ndv.t.late SELECT id, concat('x', CAST(id AS STRING)) FROM range(500, 1500)")
    // properties set AFTER data exists → old files have no sketches
    spark.sql("""ALTER TABLE ndv.t.late SET TBLPROPERTIES
                 ('graft.ndv-columns' = 'k', 'graft.bloom-columns' = 'v')""")
    val store = new SnapshotStore(Paths.get(wh, "t", "late"))
    assert(store.head().get.files.forall(f => f.ndv.isEmpty && f.blooms.isEmpty))

    val nFiles = store.head().get.files.size
    val out = spark.sql("CALL ndv.system.analyze('t.late')").head()
    assert(out.getLong(2) == nFiles.toLong) // every file analyzed
    val head = store.head().get
    assert(head.operation == "analyze")
    assert(head.files.forall(f => f.ndv.contains("k") && f.blooms.contains("v")))

    // merged NDV is ~1500 (overlapping ranges), not the 2000 a naive sum gives
    val est = spark.sql(
      "SELECT ndv_estimate FROM ndv.t.late.stats WHERE column = 'k'")
      .head().getLong(0)
    assert(math.abs(est - 1500).toDouble / 1500 < 0.05, s"estimate $est")

    // re-analyze is a no-op (no files missing sketches)
    val v = store.currentVersion().get
    spark.sql("CALL ndv.system.analyze('t.late')").collect()
    assert(store.currentVersion().get == v)
  }

  test("tables without the property carry no sketches") {
    spark.sql("CREATE TABLE ndv.t.plain (k INT) USING iceberg")
    spark.sql("INSERT INTO ndv.t.plain VALUES (1)")
    val head = new SnapshotStore(Paths.get(wh, "t", "plain")).head().get
    assert(head.files.forall(_.ndv.isEmpty))
  }
}
