package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Branches + write-audit-publish: `create_branch` forks a metadata-only
  * snapshot chain over the shared data dir; `t.branch_<name>` reads and
  * writes it in SQL; `fast_forward` publishes the branch head as one
  * atomic main commit (refusing when main advanced past the fork);
  * `drop_branch` discards the staging chain. Orphan cleanup and snapshot
  * expiry must treat branch-referenced files as live.
  */
class BranchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-branch-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.brspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.brspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  private def store(table: String) =
    new SnapshotStore(Paths.get(wh, "demo", table))

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS brspec.demo")
  }

  private def makeTable(name: String): Unit = {
    sql(s"DROP TABLE IF EXISTS brspec.demo.$name")
    sql(s"CREATE TABLE brspec.demo.$name (id INT, v STRING) USING graft")
    sql(s"INSERT INTO brspec.demo.$name VALUES (1, 'a'), (2, 'b')")
  }

  test("write-audit-publish: stage on branch, audit, fast_forward to main") {
    makeTable("w1")
    sql("CALL brspec.system.create_branch('demo.w1', 'audit')")
    // 1. WRITE: load into the branch — main must not see it
    sql("INSERT INTO brspec.demo.w1.branch_audit VALUES (3, 'c'), (4, 'd')")
    assert(sql("SELECT count(*) FROM brspec.demo.w1").collect().head.getLong(0) == 2)
    // 2. AUDIT: real queries against the staged state
    val staged = sql("SELECT id FROM brspec.demo.w1.branch_audit ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(staged == Seq(1, 2, 3, 4))
    // 3. PUBLISH: one atomic main commit
    sql("CALL brspec.system.fast_forward('demo.w1', 'audit')")
    val main = sql("SELECT id FROM brspec.demo.w1 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(main == Seq(1, 2, 3, 4))
    assert(store("w1").head().get.operation == "publish")
    sql("CALL brspec.system.drop_branch('demo.w1', 'audit')")
    assert(store("w1").listBranches().isEmpty)
  }

  test("branch DML (UPDATE/DELETE) stays on the branch until published") {
    makeTable("w2")
    sql("CALL brspec.system.create_branch('demo.w2', 'fix')")
    sql("UPDATE brspec.demo.w2.branch_fix SET v = 'B' WHERE id = 2")
    sql("DELETE FROM brspec.demo.w2.branch_fix WHERE id = 1")
    // main untouched
    val main = sql("SELECT id, v FROM brspec.demo.w2 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(main == Seq((1, "a"), (2, "b")))
    sql("CALL brspec.system.fast_forward('demo.w2', 'fix')")
    val after = sql("SELECT id, v FROM brspec.demo.w2 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(after == Seq((2, "B")))
  }

  test("fast_forward refuses when main advanced past the fork") {
    makeTable("w3")
    sql("CALL brspec.system.create_branch('demo.w3', 'stale')")
    sql("INSERT INTO brspec.demo.w3.branch_stale VALUES (3, 'c')")
    sql("INSERT INTO brspec.demo.w3 VALUES (9, 'z')") // main advances
    val e = intercept[Exception] {
      sql("CALL brspec.system.fast_forward('demo.w3', 'stale')")
    }
    assert(e.getMessage.contains("main advanced") ||
      Option(e.getCause).exists(_.getMessage.contains("main advanced")))
    // main keeps its own row; branch content not published
    val main = sql("SELECT id FROM brspec.demo.w3 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(main == Seq(1, 2, 9))
  }

  test("publishing a branch with MOR upserts folds equality deletes") {
    sql("DROP TABLE IF EXISTS brspec.demo.w4")
    sql("""CREATE TABLE brspec.demo.w4 (id INT, v STRING) USING graft
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO brspec.demo.w4 VALUES (1, 'a'), (2, 'b')")
    sql("CALL brspec.system.create_branch('demo.w4', 'cdc')")
    val bst = store("w4").branchStore("cdc")
    Upsert.into(spark, bst,
      spark.sql("SELECT * FROM VALUES (2, 'B2'), (5, 'E') AS t(id, v)"), Seq("id"))
    sql("CALL brspec.system.fast_forward('demo.w4', 'cdc')")
    val head = store("w4").head().get
    assert(head.deleteFiles.forall(_.kind != "equality"),
      "published snapshot must not carry branch-relative equality deletes")
    val main = sql("SELECT id, v FROM brspec.demo.w4 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(main == Seq((1, "a"), (2, "B2"), (5, "E")))
    // sequence sanity: a post-publish upsert must NOT mask these rows
    Upsert.into(spark, store("w4"),
      spark.sql("SELECT * FROM VALUES (1, 'A9') AS t(id, v)"), Seq("id"))
    val after = sql("SELECT id, v FROM brspec.demo.w4 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(after == Seq((1, "A9"), (2, "B2"), (5, "E")))
  }

  test("orphan cleanup and expiry keep branch-referenced files alive") {
    makeTable("w5")
    sql("CALL brspec.system.create_branch('demo.w5', 'keep')")
    sql("INSERT INTO brspec.demo.w5.branch_keep VALUES (7, 'g')")
    // branch-only data file is referenced by NO main snapshot
    Maintenance.removeOrphanFiles(store("w5"))
    assert(sql("SELECT count(*) FROM brspec.demo.w5.branch_keep")
      .collect().head.getLong(0) == 3, "orphan cleanup ate a branch file")
    // churn main so expiry has versions to drop, then expire hard
    (0 until 4).foreach(i =>
      sql(s"INSERT OVERWRITE brspec.demo.w5 VALUES ($i, 'x')"))
    Maintenance.expireSnapshots(store("w5"), keepLast = 1)
    assert(sql("SELECT count(*) FROM brspec.demo.w5.branch_keep")
      .collect().head.getLong(0) == 3, "expiry deleted branch-pinned files")
  }

  test("VERSION AS OF '<branch>' reads the branch head in SQL") {
    makeTable("w7")
    sql("CALL brspec.system.create_branch('demo.w7', 'peek')")
    sql("INSERT INTO brspec.demo.w7.branch_peek VALUES (3, 'c')")
    val viaVersion = sql(
      "SELECT id FROM brspec.demo.w7 VERSION AS OF 'peek' ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(viaVersion == Seq(1, 2, 3))
    assert(sql("SELECT count(*) FROM brspec.demo.w7")
      .collect().head.getLong(0) == 2)
  }

  test("changelog procedure registers a SQL-queryable CDC view") {
    makeTable("w8")
    sql("INSERT INTO brspec.demo.w8 VALUES (3, 'c')")
    sql("DELETE FROM brspec.demo.w8 WHERE id = 1")
    val head = store("w8").currentVersion().get
    sql(s"CALL brspec.system.changelog('demo.w8', 1, $head, 'w8_changes')")
    val ch = sql("""SELECT id, _change_type FROM w8_changes
                    ORDER BY _commit_version, id""")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(ch == Seq((1, "insert"), (2, "insert"), (3, "insert"),
      (1, "delete")))
  }

  test("@branch procedure addressing: maintain the staged chain directly") {
    sql("DROP TABLE IF EXISTS brspec.demo.w9")
    sql("""CREATE TABLE brspec.demo.w9 (id INT, v STRING) USING graft
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO brspec.demo.w9 VALUES (1, 'a'), (2, 'b')")
    sql("CALL brspec.system.create_branch('demo.w9', 'stage')")
    Upsert.into(spark, store("w9").branchStore("stage"),
      spark.sql("SELECT * FROM VALUES (2, 'B') AS t(id, v)"), Seq("id"))
    // fold the branch's pending deletes IN PLACE via @branch addressing
    sql("CALL brspec.system.rewrite_deletes('demo.w9@stage')")
    assert(store("w9").branchStore("stage").head().get.deleteFiles.isEmpty)
    val staged = sql("SELECT id, v FROM brspec.demo.w9.branch_stage ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(staged == Seq((1, "a"), (2, "B")))
    // destructive chain-wide maintenance is refused on a branch
    val e = intercept[Exception] {
      sql("CALL brspec.system.expire_snapshots('demo.w9@stage', 1)")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("main chain"))
    // malformed branch refs are rejected, never resolved as paths
    for (bad <- Seq("demo.w9@..", "demo.w9@", "demo.w9@.x")) {
      val eb = intercept[Exception] {
        sql(s"CALL brspec.system.rewrite_deletes('$bad')")
      }
      assert((eb.getMessage + Option(eb.getCause).map(_.getMessage).getOrElse(""))
        .matches("(?s).*(invalid branch|bad table reference).*"), s"for $bad")
    }
  }

  test("branch time travel works within the branch chain") {
    makeTable("w6")
    sql("CALL brspec.system.create_branch('demo.w6', 'tt')")
    sql("INSERT INTO brspec.demo.w6.branch_tt VALUES (3, 'c')")
    val bst = store("w6").branchStore("tt")
    val versions = bst.listVersions()
    assert(versions.size == 2) // fork copy + branch append
    assert(bst.read(versions.min).totalRows == 2)
    assert(bst.read(versions.max).totalRows == 3)
  }
}
