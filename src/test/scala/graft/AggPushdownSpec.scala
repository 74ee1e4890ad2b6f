package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Metadata-only aggregate pushdown: full-table COUNT(*) / COUNT(col) /
  * MIN / MAX are answered from snapshot statistics with zero data files
  * opened — and REFUSED (falling back to a real scan, still correct)
  * whenever the stats can't prove the answer: residual filters, pending
  * equality deletes, missing per-file stats, string columns.
  */
class AggPushdownSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-aggwh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.aggspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.aggspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  private def plan(q: String): String =
    sql(q).queryExecution.explainString(ExplainMode.fromString("formatted"))

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS aggspec.demo")
    sql("""CREATE TABLE aggspec.demo.t (id INT, grp STRING, v DOUBLE,
             d DATE)
           USING graft""")
    sql("""INSERT INTO aggspec.demo.t VALUES
           (1, 'a', 1.5, DATE '2024-01-01'),
           (2, 'a', NULL, DATE '2024-06-30'),
           (3, 'b', -2.5, NULL),
           (4, NULL, 7.25, DATE '2023-12-31')""")
    sql("INSERT INTO aggspec.demo.t VALUES (5, 'c', 0.0, DATE '2025-02-28')")
  }

  test("COUNT(*) is answered from metadata — no file read") {
    val p = plan("SELECT count(*) FROM aggspec.demo.t")
    assert(p.contains("GraftMetadataAggScan"), s"not pushed:\n$p")
    assert(sql("SELECT count(*) FROM aggspec.demo.t")
      .collect().head.getLong(0) == 5)
  }

  test("COUNT(col) subtracts per-file null counts from metadata") {
    val p = plan("SELECT count(v) FROM aggspec.demo.t")
    assert(p.contains("GraftMetadataAggScan"), s"not pushed:\n$p")
    assert(sql("SELECT count(v) FROM aggspec.demo.t")
      .collect().head.getLong(0) == 4)
    assert(sql("SELECT count(d) FROM aggspec.demo.t")
      .collect().head.getLong(0) == 4)
  }

  test("MIN/MAX over numeric and date columns come from file stats") {
    val p = plan("SELECT min(v), max(v), min(id), max(d) FROM aggspec.demo.t")
    assert(p.contains("GraftMetadataAggScan"), s"not pushed:\n$p")
    val r = sql("SELECT min(v), max(v), min(id), max(d) FROM aggspec.demo.t")
      .collect().head
    assert(r.getDouble(0) == -2.5 && r.getDouble(1) == 7.25)
    assert(r.getInt(2) == 1)
    assert(r.getDate(3).toString == "2025-02-28")
  }

  test("filtered aggregates are NOT pushed and stay correct") {
    val q = "SELECT count(*) FROM aggspec.demo.t WHERE id > 2"
    assert(!plan(q).contains("GraftMetadataAggScan"))
    assert(sql(q).collect().head.getLong(0) == 3)
  }

  test("MIN/MAX on a string column are NOT pushed (truncation risk)") {
    val q = "SELECT max(grp) FROM aggspec.demo.t"
    assert(!plan(q).contains("GraftMetadataAggScan"))
    assert(sql(q).collect().head.getString(0) == "c")
  }

  test("position deletes: COUNT(*) stays exact and pushed; MIN/MAX refuse") {
    sql("""CREATE TABLE aggspec.demo.mor (id INT, v DOUBLE)
           USING graft
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO aggspec.demo.mor VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    sql("DELETE FROM aggspec.demo.mor WHERE id = 1 OR id = 3") // positional
    val pc = plan("SELECT count(*) FROM aggspec.demo.mor")
    assert(pc.contains("GraftMetadataAggScan"),
      s"count under position deletes should push (tuple counts exact):\n$pc")
    assert(sql("SELECT count(*) FROM aggspec.demo.mor")
      .collect().head.getLong(0) == 1)
    val pm = plan("SELECT min(v) FROM aggspec.demo.mor")
    assert(!pm.contains("GraftMetadataAggScan"),
      "min under deletes must fall back (extreme row may be deleted)")
    assert(sql("SELECT min(v) FROM aggspec.demo.mor")
      .collect().head.getDouble(0) == 2.0)
  }

  test("equality deletes: COUNT(*) refuses (matched count unknown)") {
    sql("""CREATE TABLE aggspec.demo.eq (id INT, grp STRING)
           USING graft
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO aggspec.demo.eq VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    sql("DELETE FROM aggspec.demo.eq WHERE grp = 'a'") // equality kind
    val p = plan("SELECT count(*) FROM aggspec.demo.eq")
    assert(!p.contains("GraftMetadataAggScan"))
    assert(sql("SELECT count(*) FROM aggspec.demo.eq")
      .collect().head.getLong(0) == 1)
    // folding restores the metadata path
    sql("CALL aggspec.system.rewrite_deletes('demo.eq')")
    assert(plan("SELECT count(*) FROM aggspec.demo.eq")
      .contains("GraftMetadataAggScan"))
    assert(sql("SELECT count(*) FROM aggspec.demo.eq")
      .collect().head.getLong(0) == 1)
  }

  test("pushdown keys stats by PHYSICAL name after a column rename") {
    sql("CREATE TABLE aggspec.demo.rn (id INT, v DOUBLE) USING graft")
    sql("INSERT INTO aggspec.demo.rn VALUES (1, 1.5), (2, 9.5)")
    sql("ALTER TABLE aggspec.demo.rn RENAME COLUMN v TO value")
    val p = plan("SELECT min(value), max(value), count(value) FROM aggspec.demo.rn")
    assert(p.contains("GraftMetadataAggScan"), s"not pushed after rename:\n$p")
    val r = sql("SELECT min(value), max(value), count(value) FROM aggspec.demo.rn")
      .collect().head
    assert(r.getDouble(0) == 1.5 && r.getDouble(1) == 9.5 && r.getLong(2) == 2)
  }

  test("LIMIT pushdown truncates the scanned file list") {
    sql("CREATE TABLE aggspec.demo.lim (id INT) USING graft")
    // several separate inserts -> several data files
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO aggspec.demo.lim VALUES (${i * 2}), (${i * 2 + 1})"))
    val nFiles = new SnapshotStore(
      java.nio.file.Paths.get(wh, "demo", "lim")).head().get.files.size
    assert(nFiles >= 4)
    val FilesPat = """files=(\d+)/(\d+)""".r
    def scanned(p: String): Int =
      FilesPat.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(-1)
    val p = plan("SELECT id FROM aggspec.demo.lim LIMIT 2")
    val k = scanned(p)
    assert(k >= 1 && k < nFiles,
      s"LIMIT 2 should scan a strict prefix of $nFiles files, got $k:\n$p")
    assert(sql("SELECT id FROM aggspec.demo.lim LIMIT 2").collect().length == 2)
    // a filtered LIMIT must NOT truncate by limit — only stats pruning may
    // shrink the set. `id >= 0` matches every file (stats prune nothing),
    // so any reduction would be the limit wrongly dropping matching files.
    val pf = plan("SELECT id FROM aggspec.demo.lim WHERE id >= 0 LIMIT 1")
    assert(scanned(pf) == nFiles,
      s"filtered LIMIT must not truncate the file list:\n$pf")
    assert(sql("SELECT id FROM aggspec.demo.lim WHERE id >= 6 LIMIT 1")
      .collect().length == 1)
  }

  test("LIMIT under exact partition filters truncates to matching files") {
    sql("""CREATE TABLE aggspec.demo.plim (day INT, v INT)
           USING graft PARTITIONED BY (day)""")
    // 3 separate inserts -> 3 files for day=1, plus day=2 files
    (0 until 3).foreach(i =>
      sql(s"INSERT INTO aggspec.demo.plim VALUES (1, $i), (2, ${10 + i})"))
    val FilesPat = """files=(\d+)/(\d+)""".r
    def scanned(p: String): Int =
      FilesPat.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(-1)
    val p = plan("SELECT v FROM aggspec.demo.plim WHERE day = 1 LIMIT 1")
    assert(scanned(p) == 1,
      s"LIMIT 1 over day=1 should open one matching file:\n$p")
    val got = sql("SELECT v FROM aggspec.demo.plim WHERE day = 1 LIMIT 2")
      .collect().map(_.getInt(0))
    assert(got.length == 2 && got.forall(v => v >= 0 && v < 3),
      s"rows must come from day=1: ${got.mkString(",")}")
    // residual filters still refuse the limit prefix
    val pr = plan("SELECT v FROM aggspec.demo.plim WHERE v >= 0 LIMIT 1")
    assert(scanned(pr) == 6, s"residual-filtered LIMIT must not truncate:\n$pr")
  }

  test("group-by over a NON-partition column is NOT pushed") {
    val q = "SELECT grp, count(*) FROM aggspec.demo.t GROUP BY grp"
    assert(!plan(q).contains("GraftMetadataAggScan"))
    assert(sql(q).collect().length == 4) // a, b, c, NULL
  }

  test("GROUP BY identity partition column answers from metadata") {
    sql("""CREATE TABLE aggspec.demo.pt (day INT, v DOUBLE)
           USING graft PARTITIONED BY (day)""")
    sql("""INSERT INTO aggspec.demo.pt VALUES
           (1, 1.0), (1, 2.0), (2, -3.5), (2, NULL), (NULL, 9.0)""")
    sql("INSERT INTO aggspec.demo.pt VALUES (1, 7.5), (3, 0.25)")
    val q = """SELECT day, count(*) AS c, count(v) AS cv,
                      min(v) AS lo, max(v) AS hi
               FROM aggspec.demo.pt GROUP BY day"""
    val p = plan(q)
    assert(p.contains("GraftMetadataAggScan"), s"not pushed:\n$p")
    val got = sql(q).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getInt(0)) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4)))).toMap
    assert(got.size == 4)
    assert(got(1) == ((3L, 3L, 1.0, 7.5)))
    assert(got(2) == ((2L, 1L, -3.5, -3.5)))
    assert(got(3) == ((1L, 1L, 0.25, 0.25)))
    assert(got(null) == ((1L, 1L, 9.0, 9.0))) // NULL partition group
  }

  test("grouped pushdown matches a real scan on a string partition column") {
    sql("""CREATE TABLE aggspec.demo.pts (region STRING, x INT)
           USING graft PARTITIONED BY (region)""")
    sql("""INSERT INTO aggspec.demo.pts VALUES
           ('emea', 1), ('emea', 2), ('apac', 3), (NULL, 4)""")
    val q = """SELECT region, count(*) AS c, max(x) AS hi
               FROM aggspec.demo.pts GROUP BY region"""
    assert(plan(q).contains("GraftMetadataAggScan"))
    val viaMeta = sql(q).collect().map(_.toString).sorted
    // same query against the raw rows (group col aliased off-partition)
    val viaScan = sql(
      """SELECT r AS region, count(*) AS c, max(x) AS hi FROM
         (SELECT region AS r, x FROM aggspec.demo.pts) GROUP BY r""")
      .collect().map(_.toString).sorted
    assert(viaMeta.sameElements(viaScan))
  }

  test("grouped pushdown refuses under PENDING deletes and stays correct") {
    // COW deletes leave a clean snapshot (pushdown stays exact); only
    // merge-on-read leaves pending tuples whose per-group counts are
    // unprovable — that is the refusal case
    sql("""CREATE TABLE aggspec.demo.ptd (day INT, v DOUBLE)
           USING graft PARTITIONED BY (day)
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO aggspec.demo.ptd VALUES (1, 1.0), (1, 2.0), (2, 3.0)")
    sql("DELETE FROM aggspec.demo.ptd WHERE v = 2.0")
    val q = "SELECT day, count(*) AS c FROM aggspec.demo.ptd GROUP BY day"
    assert(!plan(q).contains("GraftMetadataAggScan"),
      "per-group counts are unprovable under pending deletes")
    val got = sql(q).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 2 -> 1L))

    // a COW-deleted twin keeps the pushdown and stays exact
    sql("""CREATE TABLE aggspec.demo.ptc (day INT, v DOUBLE)
           USING graft PARTITIONED BY (day)""")
    sql("INSERT INTO aggspec.demo.ptc VALUES (1, 1.0), (1, 2.0), (2, 3.0)")
    sql("DELETE FROM aggspec.demo.ptc WHERE v = 2.0")
    val qc = "SELECT day, count(*) AS c FROM aggspec.demo.ptc GROUP BY day"
    assert(plan(qc).contains("GraftMetadataAggScan"))
    val gotC = sql(qc).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(gotC == Map(1 -> 1L, 2 -> 1L))
  }

  test("SELECT DISTINCT partition column is metadata-only (group-by, no aggs)") {
    val q = "SELECT DISTINCT day FROM aggspec.demo.pt"
    assert(plan(q).contains("GraftMetadataAggScan"))
    val got = sql(q).collect()
      .map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSet
    assert(got == Set(1, 2, 3, null))
  }

  test("EXACT identity-partition filters push completely: filtered metadata aggs") {
    // pt (built above): day 1 -> 3 rows, 2 -> 2, 3 -> 1, NULL -> 1
    val q1 = "SELECT count(*) AS c FROM aggspec.demo.pt WHERE day = 1"
    assert(plan(q1).contains("GraftMetadataAggScan"), s"not pushed:\n${plan(q1)}")
    assert(sql(q1).collect().head.getLong(0) == 3)
    // range + grouped
    val q2 = """SELECT day, count(*) AS c, min(v) AS lo
                FROM aggspec.demo.pt WHERE day >= 2 GROUP BY day"""
    assert(plan(q2).contains("GraftMetadataAggScan"))
    assert(sql(q2).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      == Map(2 -> 2L, 3 -> 1L))
    // IS NULL hits the sentinel group
    val q3 = "SELECT count(*) AS c FROM aggspec.demo.pt WHERE day IS NULL"
    assert(plan(q3).contains("GraftMetadataAggScan"))
    assert(sql(q3).collect().head.getLong(0) == 1)
    // Kleene: NOT(day = 1) excludes the NULL-day row too
    val q4 = "SELECT count(*) AS c FROM aggspec.demo.pt WHERE NOT (day = 1)"
    assert(plan(q4).contains("GraftMetadataAggScan"))
    assert(sql(q4).collect().head.getLong(0) == 3)
  }

  test("claimed partition filters drop Spark's re-apply Filter node") {
    sql("""CREATE TABLE aggspec.demo.pfe (day INT, v DOUBLE)
           USING graft PARTITIONED BY (day)""")
    sql("""INSERT INTO aggspec.demo.pfe VALUES
           (1, 1.0), (1, 2.0), (1, 7.5), (2, -3.5), (NULL, 9.0)""")
    val df = sql("SELECT v FROM aggspec.demo.pfe WHERE day = 1")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Filter"), s"expected no residual filter:\n$opt")
    assert(df.collect().map(_.getDouble(0)).sorted.sameElements(
      Array(1.0, 2.0, 7.5)))
    // mixed: the non-partition conjunct stays residual, result correct
    val mixed = sql("SELECT v FROM aggspec.demo.pfe WHERE day = 1 AND v > 1.5")
    assert(mixed.queryExecution.optimizedPlan.toString.contains("Filter"))
    assert(mixed.collect().map(_.getDouble(0)).sorted.sameElements(
      Array(2.0, 7.5)))
  }

  test("filtered aggs refuse: residual filters, string partitions, pending deletes") {
    // non-partition residual
    val q1 = "SELECT count(*) AS c FROM aggspec.demo.pt WHERE v > 0"
    assert(!plan(q1).contains("GraftMetadataAggScan"))
    assert(sql(q1).collect().head.getLong(0) == 5)
    // string identity partitions are never claimed (NULL-sentinel ambiguity)
    val q2 = "SELECT count(*) AS c FROM aggspec.demo.pts WHERE region = 'emea'"
    assert(!plan(q2).contains("GraftMetadataAggScan"))
    assert(sql(q2).collect().head.getLong(0) == 2)
    // pending MOR deletes: subset counts unprovable
    val q3 = "SELECT count(*) AS c FROM aggspec.demo.ptd WHERE day = 1"
    assert(!plan(q3).contains("GraftMetadataAggScan"))
    assert(sql(q3).collect().head.getLong(0) == 1)
  }

  test("partition evolution refuses exactness for fields old files lack") {
    sql("""CREATE TABLE aggspec.demo.pev (day INT, k2 INT, v DOUBLE)
           USING graft PARTITIONED BY (day)""")
    sql("INSERT INTO aggspec.demo.pev VALUES (1, 10, 1.0), (2, 20, 2.0)")
    sql("CALL aggspec.system.set_partition_spec('demo.pev', 'k2')")
    sql("INSERT INTO aggspec.demo.pev VALUES (3, 10, 3.0), (4, 30, 4.0)")
    // gen-1 files carry no k2 partition value: the filter must stay
    // residual and the scan must still find the gen-1 k2=10 row
    val q = "SELECT count(*) AS c FROM aggspec.demo.pev WHERE k2 = 10"
    assert(!plan(q).contains("GraftMetadataAggScan"))
    assert(sql(q).collect().head.getLong(0) == 2)
    val df = sql("SELECT v FROM aggspec.demo.pev WHERE k2 = 10")
    assert(df.queryExecution.optimizedPlan.toString.contains("Filter"),
      "k2 must not be claimed as fully pushed across generations")
    assert(df.collect().map(_.getDouble(0)).sorted.sameElements(Array(1.0, 3.0)))
  }
}
