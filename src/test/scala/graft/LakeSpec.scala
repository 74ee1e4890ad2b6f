package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.AnalysisException
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** End-to-end lakehouse-surface tests (SURVEY.md §5.2.2): the reference's
  * exercised DDL/DML/query flows from `getting_started.ipynb` and
  * `iceberg_queries.ipynb`, run through SQL against the Graft catalog —
  * namespaces, partitioned tables, inserts, filters, joins, metadata
  * tables, time travel, schema evolution, DELETE, compaction, concurrency.
  */
class LakeSpec extends AnyFunSuite with BeforeAndAfterAll {

  // Own catalog name: suites run in parallel in one session, and catalog
  // instances are cached per name at first use — sharing "graft" with the
  // LakeOps queries would bind this suite to whichever warehouse conf won.
  private val wh = Files.createTempDirectory("graft-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.lakespec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.lakespec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    // reference demo flow: namespace + partitioned users table + seed rows
    // (iceberg_queries.ipynb:72,92-100,124-131)
    sql("CREATE NAMESPACE IF NOT EXISTS lakespec.demo")
    sql("""CREATE TABLE lakespec.demo.users (
             id INT, name STRING, email STRING, created_date DATE)
           USING iceberg PARTITIONED BY (created_date)""")
    sql("""INSERT INTO lakespec.demo.users VALUES
           (1, 'Alice', 'alice@example.com', DATE '2025-01-01'),
           (2, 'Bob', 'bob@example.com', DATE '2025-01-02'),
           (3, 'Charlie', 'charlie@example.com', DATE '2025-01-03'),
           (4, 'Diana', 'diana@example.com', DATE '2025-01-04')""")
  }

  test("SHOW NAMESPACES lists created namespace (D2/D3)") {
    val ns = sql("SHOW NAMESPACES IN lakespec").collect().map(_.getString(0))
    assert(ns.contains("demo"))
  }

  test("SELECT * and filtered scans (S1, P1, P3)") {
    assert(sql("SELECT * FROM lakespec.demo.users").count() == 4)
    val filtered = sql("SELECT name FROM lakespec.demo.users WHERE id > 2")
      .collect().map(_.getString(0)).sorted
    assert(filtered.sameElements(Array("Charlie", "Diana")))
  }

  test("DataFrame API table handle (S3, P2, P4)") {
    val df = spark.table("lakespec.demo.users")
      .filter(col("id") > 1).select("name", "email")
    assert(df.count() == 3)
  }

  test("partition pruning skips files via partition values + stats (P6)") {
    val store = new SnapshotStore(Paths.get(wh, "demo", "users"))
    val snap = store.head().get
    assert(snap.files.size == 4) // one file per created_date partition
    val pruned = StatsPruner.prune(snap.files,
      Seq(org.apache.spark.sql.sources.EqualTo("created_date",
        java.sql.Date.valueOf("2025-01-02"))),
      snap.partitionSpec)
    assert(pruned.size == 1)
    assert(pruned.head.partitionValues("created_date") == "2025-01-02")
  }

  test("append creates a new snapshot; time travel reads the old one (S6)") {
    sql("""INSERT INTO lakespec.demo.users VALUES
           (5, 'Eve', 'eve@example.com', DATE '2025-01-05')""")
    assert(sql("SELECT * FROM lakespec.demo.users").count() == 5)
    // version 2 was the 4-row snapshot (v1 = create, v2 = first insert)
    assert(sql("SELECT * FROM lakespec.demo.users VERSION AS OF 2").count() == 4)
  }

  test("TIMESTAMP AS OF resolves to the snapshot current at that time (S7)") {
    val store = new SnapshotStore(Paths.get(wh, "demo", "users"))
    val v2ts = new java.sql.Timestamp(store.read(2).timestampMs)
    val cnt = sql(
      s"SELECT * FROM lakespec.demo.users TIMESTAMP AS OF '$v2ts'").count()
    assert(cnt == 4)
  }

  test("history/snapshots/files metadata tables (S4, S5)") {
    val hist = sql("SELECT * FROM lakespec.demo.users.history")
    assert(hist.columns.toSeq == Seq("made_current_at", "snapshot_id",
      "parent_id", "is_current_ancestor"))
    assert(hist.count() >= 3)
    val snaps = sql(
      "SELECT operation FROM lakespec.demo.users.snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0))
    assert(snaps.take(3).sameElements(Array("create", "append", "append")))
    val files = sql("SELECT * FROM lakespec.demo.users.files")
    assert(files.count() == 5) // 5 partitions → 5 files
  }

  test("partitions/refs metadata tables") {
    val parts = sql(
      """SELECT partition['created_date'] AS pd, file_count, record_count
         FROM lakespec.demo.users.partitions ORDER BY pd""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(parts.length == 5) // one row per partition value
    assert(parts.forall { case (_, fc, rc) => fc == 1 && rc == 1 })
    assert(parts.map(_._1).toSeq == (1 to 5).map(d => f"2025-01-0$d"))

    val store = new SnapshotStore(Paths.get(wh, "demo", "users"))
    store.setRef("audit", 2L)
    try {
      val refs = sql("SELECT name, type, snapshot_id FROM lakespec.demo.users.refs")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(refs.toSeq == Seq(("audit", "TAG", 2L)))
    } finally store.dropRef("audit")
  }

  test("inner equi-join through the catalog (J1, iceberg_queries.ipynb:291)") {
    sql("""CREATE TABLE IF NOT EXISTS lakespec.demo.orders (
             order_id INT, user_id INT, amount DECIMAL(10,2), order_date DATE)
           USING iceberg PARTITIONED BY (order_date)""")
    sql("""INSERT INTO lakespec.demo.orders VALUES
           (101, 1, 150.50, DATE '2025-01-10'),
           (102, 2, 200.00, DATE '2025-01-11'),
           (103, 1, 75.25, DATE '2025-01-12'),
           (104, 3, 300.00, DATE '2025-01-13')""")
    val joined = sql(
      """SELECT u.name, o.order_id, o.amount
         FROM lakespec.demo.users u JOIN lakespec.demo.orders o ON u.id = o.user_id
         ORDER BY o.order_id""")
    assert(joined.count() == 4)
    assert(joined.head().getString(0) == "Alice")
  }

  test("ALTER TABLE ADD COLUMN null-fills old files (D12)") {
    sql("ALTER TABLE lakespec.demo.users ADD COLUMN age INT")
    val withAge = sql("SELECT id, age FROM lakespec.demo.users WHERE id <= 5")
    assert(withAge.count() == 5)
    assert(withAge.filter(col("age").isNull).count() == 5) // old files → null
    sql("""INSERT INTO lakespec.demo.users VALUES
           (6, 'Frank', 'frank@example.com', DATE '2025-01-06', 33)""")
    val mixed = sql("SELECT age FROM lakespec.demo.users WHERE id = 6")
    assert(mixed.head().getInt(0) == 33)
  }

  test("DESCRIBE TABLE and SHOW TBLPROPERTIES (D10, D11)") {
    val desc = sql("DESCRIBE TABLE lakespec.demo.users").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("age") == "int")
    assert(desc.contains("created_date"))
    // DESCRIBE EXTENDED adds table-detail rows (getting_started.ipynb:163)
    val ext = sql("DESCRIBE EXTENDED lakespec.demo.users").collect()
      .map(_.getString(0))
    assert(ext.length > desc.size)
    // Spark hides reserved properties (provider/location/owner) here
    val props = sql("SHOW TBLPROPERTIES lakespec.demo.users").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("format") == "parquet")
    assert(props("total-records").toLong >= 6)
  }

  test("SHOW TABLES lists both tables (D5)") {
    val tables = sql("SHOW TABLES IN lakespec.demo").collect()
      .map(_.getString(1)).toSet
    assert(Set("users", "orders").subsetOf(tables))
  }

  test("DELETE FROM with copy-on-write rewrite, only touched files (D-row-level)") {
    sql("""CREATE TABLE lakespec.demo.del_t (id INT, v STRING, d DATE)
           USING graft PARTITIONED BY (d)""")
    sql("""INSERT INTO lakespec.demo.del_t VALUES
           (1, 'a', DATE '2025-02-01'), (2, 'b', DATE '2025-02-01'),
           (3, 'c', DATE '2025-02-02'), (4, 'd', DATE '2025-02-03')""")
    sql("DELETE FROM lakespec.demo.del_t WHERE id = 2")
    val rows = sql("SELECT id FROM lakespec.demo.del_t ORDER BY id")
      .collect().map(_.getInt(0))
    assert(rows.sameElements(Array(1, 3, 4)))
    // only the 2025-02-01 partition file was rewritten
    val store = new SnapshotStore(Paths.get(wh, "demo", "del_t"))
    val s = store.head().get
    assert(s.operation == "delete")
    assert(s.summary("deleted-candidate-files") == "1")
  }

  test("INSERT OVERWRITE replaces table content (S11)") {
    sql("""CREATE TABLE lakespec.demo.ovr (k INT, v STRING) USING graft""")
    sql("INSERT INTO lakespec.demo.ovr VALUES (1, 'x'), (2, 'y')")
    sql("INSERT OVERWRITE lakespec.demo.ovr VALUES (9, 'z')")
    val rows = sql("SELECT k, v FROM lakespec.demo.ovr").collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 9)
    // old content still time-travelable
    assert(sql("SELECT * FROM lakespec.demo.ovr VERSION AS OF 2").count() == 2)
  }

  test("days() hidden-partition transform with pruning (D7, §2.11.2)") {
    sql("""CREATE TABLE lakespec.demo.ts_events (id INT, name STRING, created_at TIMESTAMP)
           USING graft PARTITIONED BY (days(created_at))""")
    sql("""INSERT INTO lakespec.demo.ts_events VALUES
           (1, 'a', TIMESTAMP '2024-11-25 10:00:00'),
           (2, 'b', TIMESTAMP '2024-11-25 23:59:00'),
           (3, 'c', TIMESTAMP '2024-11-26 00:01:00')""")
    assert(sql("""SELECT * FROM lakespec.demo.ts_events
                  WHERE created_at >= TIMESTAMP '2024-11-26 00:00:00'""")
      .count() == 1)
    val store = new SnapshotStore(Paths.get(wh, "demo", "ts_events"))
    val snap = store.head().get
    // two distinct day-partitions (a partition may span several task files)
    val partVals = snap.files.map(_.partitionValues("days(created_at)")).toSet
    assert(partVals == Set("2024-11-25", "2024-11-26"))
    val pruned = StatsPruner.prune(snap.files,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("created_at",
        java.sql.Timestamp.valueOf("2024-11-26 00:00:00"))),
      snap.partitionSpec)
    assert(pruned.nonEmpty)
    assert(pruned.forall(_.partitionValues("days(created_at)") == "2024-11-26"))
  }

  test("duplicate-on-reinsert is by-design append semantics (§2.11.3)") {
    sql("""CREATE TABLE lakespec.demo.dup_t (id INT, v STRING) USING graft""")
    sql("INSERT INTO lakespec.demo.dup_t VALUES (1, 'x')")
    sql("INSERT INTO lakespec.demo.dup_t VALUES (1, 'x')")
    assert(sql("SELECT * FROM lakespec.demo.dup_t").count() == 2)
  }

  test("compaction merges small files and preserves the row multiset (D13)") {
    val store = new SnapshotStore(Paths.get(wh, "demo", "dup_t"))
    val before = sql("SELECT v FROM lakespec.demo.dup_t").collect().toSeq
    val preFiles = store.head().get.files.size
    assert(preFiles >= 2)
    Maintenance.compact(spark, store)
    spark.sessionState.catalogManager.catalog("lakespec")
      .asInstanceOf[GraftCatalog]
      .invalidateTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("demo"), "dup_t"))
    val after = sql("SELECT v FROM lakespec.demo.dup_t").collect().toSeq
    assert(after.groupBy(identity).view.mapValues(_.size).toMap ==
      before.groupBy(identity).view.mapValues(_.size).toMap)
    assert(store.head().get.files.size == 1)
    assert(store.head().get.operation == "replace")
  }

  test("expire snapshots removes old versions and unreferenced files") {
    val store = new SnapshotStore(Paths.get(wh, "demo", "ovr"))
    val before = store.listVersions().size
    assert(before >= 3)
    val expired = Maintenance.expireSnapshots(store, keepLast = 1)
    assert(expired.nonEmpty)
    assert(store.listVersions().size == 1)
    // head still reads fine after expiry
    assert(sql("SELECT * FROM lakespec.demo.ovr").count() == 1)
  }

  test("concurrent appends both land (optimistic commit retry)") {
    sql("CREATE TABLE lakespec.demo.conc (id INT) USING graft")
    val store = new SnapshotStore(Paths.get(wh, "demo", "conc"))
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val dfs = (1 to 4).map(i => Seq(i).toDF("id"))
    val futures = dfs.map(df => Future {
      GraftWriter.insert(spark, store, df, overwrite = false)
    })
    Await.result(Future.sequence(futures), 120.seconds)
    assert(sql("SELECT * FROM lakespec.demo.conc").count() == 4)
    assert(store.head().get.version == 5) // create + 4 appends
  }

  test("unpartitioned smoke table round trip (getting_started.ipynb:85-102)") {
    sql("CREATE TABLE lakespec.demo.test_table (id INT, name STRING) USING graft")
    sql("INSERT INTO lakespec.demo.test_table VALUES (1, 'Hello'), (2, 'World')")
    val rows = sql("SELECT * FROM lakespec.demo.test_table ORDER BY id").collect()
    assert(rows.map(_.getString(1)).sameElements(Array("Hello", "World")))
  }

  test("DROP TABLE and DROP NAMESPACE CASCADE (D4, D9)") {
    sql("CREATE NAMESPACE lakespec.scratch")
    sql("CREATE TABLE lakespec.scratch.tmp (id INT) USING graft")
    sql("INSERT INTO lakespec.scratch.tmp VALUES (1)")
    sql("DROP TABLE lakespec.scratch.tmp")
    assert(sql("SHOW TABLES IN lakespec.scratch").count() == 0)
    sql("CREATE TABLE lakespec.scratch.tmp2 (id INT) USING graft")
    sql("DROP NAMESPACE lakespec.scratch CASCADE")
    val ns = sql("SHOW NAMESPACES IN lakespec").collect().map(_.getString(0))
    assert(!ns.contains("scratch"))
  }

  test("MERGE INTO: update matched, insert not-matched, delete clause (§2.11.3)") {
    sql("""CREATE TABLE lakespec.demo.mt (id INT, v STRING, d DATE)
           USING graft PARTITIONED BY (d)""")
    sql("""INSERT INTO lakespec.demo.mt VALUES
           (1,'a',DATE '2025-01-01'), (2,'b',DATE '2025-01-01'),
           (3,'c',DATE '2025-01-02')""")
    sql("CREATE TABLE lakespec.demo.msrc (id INT, v STRING, d DATE) USING graft")
    sql("""INSERT INTO lakespec.demo.msrc VALUES
           (2,'B',DATE '2025-01-01'), (9,'Z',DATE '2025-01-09')""")
    sql("""MERGE INTO lakespec.demo.mt t USING lakespec.demo.msrc s ON t.id = s.id
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (id, v, d) VALUES (s.id, s.v, s.d)""")
    val rows = sql("SELECT id, v, CAST(d AS STRING) FROM lakespec.demo.mt ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1, "a", "2025-01-01"), (2, "B", "2025-01-01"),
      (3, "c", "2025-01-02"), (9, "Z", "2025-01-09")))
    // MERGE with delete clause
    sql("""MERGE INTO lakespec.demo.mt t USING lakespec.demo.msrc s ON t.id = s.id
           WHEN MATCHED AND s.v = 'B' THEN DELETE""")
    assert(sql("SELECT id FROM lakespec.demo.mt ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(1, 3, 9))
    // committed as first-class snapshots
    val ops = sql("SELECT operation FROM lakespec.demo.mt.snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops == Seq("create", "append", "merge", "merge"))
    // merged files carry partition values → pruning still works post-merge
    val store = new SnapshotStore(Paths.get(wh, "demo", "mt"))
    assert(store.head().get.files.forall(_.partitionValues.contains("d")))
  }

  test("UPDATE rewrites only files whose stats might match") {
    sql("""CREATE TABLE lakespec.demo.ut (id INT, v STRING, d DATE)
           USING graft PARTITIONED BY (d)""")
    sql("""INSERT INTO lakespec.demo.ut VALUES
           (1,'a',DATE '2025-03-01'), (2,'b',DATE '2025-03-02'),
           (3,'c',DATE '2025-03-03')""")
    sql("UPDATE lakespec.demo.ut SET v = 'X' WHERE d = DATE '2025-03-02'")
    val rows = sql("SELECT id, v FROM lakespec.demo.ut ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "a"), (2, "X"), (3, "c")))
    val store = new SnapshotStore(Paths.get(wh, "demo", "ut"))
    val head = store.head().get
    assert(head.operation == "update")
    assert(head.summary("replaced-files").toInt == 1) // partition pruned
  }

  test("CALL lakespec.system.compact / expire_snapshots procedures (D13)") {
    sql("CREATE TABLE lakespec.demo.proc_t (id INT) USING graft")
    sql("INSERT INTO lakespec.demo.proc_t VALUES (1)")
    sql("INSERT INTO lakespec.demo.proc_t VALUES (2)")
    sql("INSERT INTO lakespec.demo.proc_t VALUES (3)")
    val store = new SnapshotStore(Paths.get(wh, "demo", "proc_t"))
    assert(store.head().get.files.size == 3)
    val res = sql("CALL lakespec.system.compact(`table` => 'demo.proc_t')").collect()
    assert(res.head.getString(0) == "demo.proc_t")
    assert(store.head().get.files.size == 1)
    assert(sql("SELECT * FROM lakespec.demo.proc_t").count() == 3)
    sql("CALL lakespec.system.expire_snapshots(`table` => 'demo.proc_t', keep_last => 1)")
    assert(store.listVersions().size == 1)
    sql("CALL lakespec.system.remove_orphan_files(`table` => 'demo.proc_t')")
    assert(sql("SELECT * FROM lakespec.demo.proc_t").count() == 3)
    // explicit age guard (Iceberg's older_than shape): an unreferenced
    // file younger than the guard survives; collected once past it
    val junk = store.tableDir.resolve("data").resolve("junk-orphan.parquet")
    Files.writeString(junk, "junk")
    sql("""CALL lakespec.system.remove_orphan_files(
             `table` => 'demo.proc_t', older_than_ms => 60000)""")
    assert(Files.exists(junk), "young unreferenced file collected")
    val swept = sql("""CALL lakespec.system.remove_orphan_files(
             `table` => 'demo.proc_t', older_than_ms => 0)""").collect()
    assert(!Files.exists(junk), "stale orphan survived an age-0 sweep")
    assert(swept.head.getLong(1) >= 1L)
    assert(sql("SELECT * FROM lakespec.demo.proc_t").count() == 3)
  }

  test("commit protocol: crash between snapshot write and hint swap recovers") {
    val dir = Files.createTempDirectory("graft-crash")
    val store = new SnapshotStore(dir.resolve("t"))
    store.init()
    store.commit(_ => Snapshot(0, None, 1L, "create",
      org.apache.spark.sql.types.StructType(Nil).json, Nil, Map.empty, Nil,
      Map.empty))
    // simulate: v2 written but hint never swapped (crash window)
    val v2 = store.read(1).copy(version = 2, parentVersion = Some(1),
      timestampMs = 2L, operation = "append")
    Files.writeString(dir.resolve("t/metadata/v2.json"), Snapshot.toJson(v2))
    assert(store.currentVersion().contains(2L)) // scan recovers past stale hint
  }
}
