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

  test("tables without the property carry no sketches") {
    spark.sql("CREATE TABLE ndv.t.plain (k INT) USING iceberg")
    spark.sql("INSERT INTO ndv.t.plain VALUES (1)")
    val head = new SnapshotStore(Paths.get(wh, "t", "plain")).head().get
    assert(head.files.forall(_.ndv.isEmpty))
  }
}
