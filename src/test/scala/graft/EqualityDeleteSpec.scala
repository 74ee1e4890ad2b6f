package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Equality deletes + merge-on-read upsert (Iceberg v2's second delete
  * kind): a pure-equality DELETE commits key VALUES with no scan; sequence
  * ordering exempts rows appended after the delete. `Upsert.into` composes
  * an append with an equality delete of the batch keys in one commit — the
  * streaming-CDC ingestion shape.
  */
class EqualityDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-eqdel-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.eqspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.eqspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  private def store(table: String) =
    new SnapshotStore(Paths.get(wh, "demo", table))

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS eqspec.demo")
  }

  private def makeTable(name: String): Unit = {
    sql(s"DROP TABLE IF EXISTS eqspec.demo.$name")
    sql(s"""CREATE TABLE eqspec.demo.$name (id INT, grp STRING, v INT)
            USING graft
            TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql(s"""INSERT INTO eqspec.demo.$name VALUES
            (1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40)""")
  }

  test("pure-equality DELETE commits with no scan (equality kind)") {
    makeTable("e1")
    val before = store("e1").head().get.files.map(_.path).sorted
    sql("DELETE FROM eqspec.demo.e1 WHERE grp = 'a'")
    val snap = store("e1").head().get
    assert(snap.files.map(_.path).sorted == before, "data files untouched")
    assert(snap.summary("delete-kind") == "equality")
    val eq = snap.deleteFiles.filter(_.kind == "equality")
    assert(eq.length == 1 && eq.head.rowCount == 1)
    val ids = sql("SELECT id FROM eqspec.demo.e1 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(3, 4))
  }

  test("rows inserted AFTER an equality delete survive (sequence ordering)") {
    makeTable("e2")
    sql("DELETE FROM eqspec.demo.e2 WHERE grp = 'a'")
    sql("INSERT INTO eqspec.demo.e2 VALUES (9, 'a', 90)")
    val rows = sql("SELECT id, grp FROM eqspec.demo.e2 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((3, "b"), (4, "b"), (9, "a")),
      "the new 'a' row must not be masked by the older equality delete")
  }

  test("IN-list DELETE becomes a multi-row equality delete") {
    makeTable("e3")
    sql("DELETE FROM eqspec.demo.e3 WHERE id IN (1, 3)")
    val snap = store("e3").head().get
    assert(snap.deleteFiles.exists(d => d.kind == "equality" && d.rowCount == 2))
    val ids = sql("SELECT id FROM eqspec.demo.e3 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(2, 4))
  }

  test("multi-column equality DELETE deletes the exact key only") {
    makeTable("e4")
    sql("DELETE FROM eqspec.demo.e4 WHERE grp = 'b' AND id = 3")
    val snap = store("e4").head().get
    assert(snap.deleteFiles.exists(d => d.kind == "equality" &&
      d.equalityColumns.toSet == Set("grp", "id")))
    val ids = sql("SELECT id FROM eqspec.demo.e4 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(1, 2, 4))
  }

  test("equality delete matching nothing is harmless") {
    makeTable("e5")
    sql("DELETE FROM eqspec.demo.e5 WHERE id = 999")
    assert(sql("SELECT count(*) FROM eqspec.demo.e5")
      .collect().head.getLong(0) == 4)
  }

  test("upsert replaces by key in one commit, keeps everything else") {
    makeTable("e6")
    val batch = spark.sql(
      "SELECT * FROM VALUES (2, 'z', 222), (5, 'z', 555) AS t(id, grp, v)")
    val snap = Upsert.into(spark, store("e6"), batch, Seq("id"))
    assert(snap.operation == "upsert")
    val rows = sql("SELECT id, grp, v FROM eqspec.demo.e6 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, "a", 10), (2, "z", 222), (3, "b", 30),
      (4, "b", 40), (5, "z", 555)))
  }

  test("repeated upserts: last write wins per key") {
    makeTable("e7")
    val st = store("e7")
    Upsert.into(spark, st,
      spark.sql("SELECT * FROM VALUES (1, 'u1', 100) AS t(id, grp, v)"), Seq("id"))
    Upsert.into(spark, st,
      spark.sql("SELECT * FROM VALUES (1, 'u2', 200), (6, 'u2', 600) AS t(id, grp, v)"),
      Seq("id"))
    val rows = sql("SELECT id, grp FROM eqspec.demo.e7 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "u2"), (2, "a"), (3, "b"), (4, "b"), (6, "u2")))
  }

  test("upsert CDC: old row emitted as delete, new row as insert") {
    makeTable("e8")
    val st = store("e8")
    Upsert.into(spark, st,
      spark.sql("SELECT * FROM VALUES (2, 'up', 999) AS t(id, grp, v)"), Seq("id"))
    val v = st.currentVersion().get
    val ch = Changes.between(spark, st, v - 1, v)
      .select("id", "grp", Changes.ChangeType)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._3)
    assert(ch.toSeq == Seq((2, "a", "delete"), (2, "up", "insert")))
  }

  test("rewrite_deletes folds equality deletes; results and counts stable") {
    makeTable("e9")
    sql("DELETE FROM eqspec.demo.e9 WHERE grp = 'a'")
    Upsert.into(spark, store("e9"),
      spark.sql("SELECT * FROM VALUES (3, 'r', 300) AS t(id, grp, v)"), Seq("id"))
    val expect = sql("SELECT id, grp, v FROM eqspec.demo.e9 ORDER BY id").collect()
    sql("CALL eqspec.system.rewrite_deletes('demo.e9')")
    val snap = store("e9").head().get
    assert(snap.deleteFiles.isEmpty)
    val after = sql("SELECT id, grp, v FROM eqspec.demo.e9 ORDER BY id").collect()
    assert(after.toSeq == expect.toSeq)
    // live rows: (3,'r',300) from the upsert + (4,'b',40); ids 1,2 were
    // equality-deleted and id 3's old row was replaced by the upsert
    assert(snap.totalRows == 2) // exact again once eq deletes folded
  }

  test("COW UPDATE on a table with a pending equality delete") {
    makeTable("e10")
    sql("DELETE FROM eqspec.demo.e10 WHERE grp = 'a'") // equality, ids 1,2
    sql("UPDATE eqspec.demo.e10 SET v = v + 1 WHERE grp = 'b'")
    val rows = sql("SELECT id, v FROM eqspec.demo.e10 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((3, 31), (4, 41)),
      "rewrite must not resurrect equality-deleted rows")
  }

  test("DROP COLUMN of a pending equality-delete key is refused") {
    makeTable("e14")
    sql("DELETE FROM eqspec.demo.e14 WHERE grp = 'a'") // eq delete keyed by grp
    val e = intercept[Exception] {
      sql("ALTER TABLE eqspec.demo.e14 DROP COLUMN grp")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("rewrite_deletes"))
    // after folding, the drop goes through
    sql("CALL eqspec.system.rewrite_deletes('demo.e14')")
    sql("ALTER TABLE eqspec.demo.e14 DROP COLUMN grp")
    assert(sql("SELECT count(*) FROM eqspec.demo.e14")
      .collect().head.getLong(0) == 2)
  }

  test("concurrent upserts serialize via optimistic commit retries") {
    makeTable("e12")
    val st = store("e12")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // two writers, disjoint key ranges, racing on the same head
    val fa = Future {
      (10 to 14).foreach { k =>
        Upsert.into(spark, st, spark.sql(
          s"SELECT * FROM VALUES ($k, 'wa', $k) AS t(id, grp, v)"), Seq("id"))
      }
    }
    val fb = Future {
      (20 to 24).foreach { k =>
        Upsert.into(spark, st, spark.sql(
          s"SELECT * FROM VALUES ($k, 'wb', $k) AS t(id, grp, v)"), Seq("id"))
      }
    }
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    val ids = sql("SELECT id FROM eqspec.demo.e12 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == (Seq(1, 2, 3, 4) ++ (10 to 14) ++ (20 to 24)),
      "every racing upsert must land exactly once")
    // versions form one linear chain (no lost commits)
    val versions = st.listVersions()
    assert(versions == (1L to versions.max))
  }

  test("equality deletes survive a column rename (physical-name keyed)") {
    makeTable("e13")
    sql("DELETE FROM eqspec.demo.e13 WHERE grp = 'a'") // eq delete on 'grp'
    sql("ALTER TABLE eqspec.demo.e13 RENAME COLUMN grp TO category")
    val ids = sql("SELECT id FROM eqspec.demo.e13 ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(3, 4), "rename must not un-delete masked rows")
    // and deleting under the NEW name still works
    sql("DELETE FROM eqspec.demo.e13 WHERE category = 'b'")
    assert(sql("SELECT count(*) FROM eqspec.demo.e13")
      .collect().head.getLong(0) == 0)
  }

  test("time travel reads the pre-delete snapshot unaffected") {
    makeTable("e11")
    val vBefore = store("e11").currentVersion().get
    sql("DELETE FROM eqspec.demo.e11 WHERE grp = 'b'")
    assert(sql(s"SELECT count(*) FROM eqspec.demo.e11 VERSION AS OF $vBefore")
      .collect().head.getLong(0) == 4)
    assert(sql("SELECT count(*) FROM eqspec.demo.e11")
      .collect().head.getLong(0) == 2)
  }

  test("equality key added with DEFAULT probes old files' default, " +
      "independent of the projection") {
    makeTable("e9")
    sql("ALTER TABLE eqspec.demo.e9 ADD COLUMN k STRING DEFAULT 'X'")
    sql("INSERT INTO eqspec.demo.e9 VALUES (5, 'c', 50, 'Y')")
    sql("DELETE FROM eqspec.demo.e9 WHERE k = 'X'")
    val snap = store("e9").head().get
    assert(snap.deleteFiles.exists(_.kind == "equality"),
      s"setup: expected the equality path, got ${snap.deleteFiles}")
    // SELECT path: rows of files predating k read its EXISTS_DEFAULT 'X'
    // and die to the delete; the explicitly-'Y' row survives
    assert(sql("SELECT id FROM eqspec.demo.e9").collect()
      .map(_.getInt(0)).toSeq == Seq(5))
    // COW path whose projection does NOT include k (the update's runtime
    // group-filter scan projects only the condition column + _file): the
    // appended probe column must read the same default — with a bare
    // (metadata-less) appended field, old files read NULL there, the
    // probe misses, and the dead id=1 row gets nominated and rewritten
    val filesBefore = snap.files.map(_.path).toSet
    sql("UPDATE eqspec.demo.e9 SET v = 0 WHERE id = 1")
    val after = store("e9").head().get
    assert(after.files.map(_.path).toSet == filesBefore,
      "a projection-dependent default probe resurrected eq-deleted rows")
    assert(sql("SELECT id, v FROM eqspec.demo.e9").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((5, 50)))
  }

  test("a 100-commit streaming-upsert chain folds to zero delete files") {
    import spark.implicits._
    makeTable("e15")
    val st = store("e15")
    // the streaming-CDC shape: 100 upsert commits cycling over 10 keys —
    // each leaves an equality-delete file, and without maintenance every
    // scan probes all of them
    (1 to 100).foreach { r =>
      val k = 100 + (r % 10)
      Upsert.into(spark, st,
        Seq((k, "cdc", r)).toDF("id", "grp", "v"), Seq("id"))
    }
    val before = st.head().get
    val eqBefore = before.deleteFiles.filter(_.kind == "equality")
    assert(eqBefore.size == 100,
      s"expected 100 accumulated equality-delete files, got ${eqBefore.size}")

    // correct answers even with the full chain pending (MOR semantics):
    // key 100+i holds the LAST round that wrote it
    def liveRows() = sql(
      "SELECT id, v FROM eqspec.demo.e15 WHERE grp = 'cdc' ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val expected = (0 until 10).map { i =>
      (100 + i, (1 to 100).filter(_ % 10 == i).max)
    }
    assert(liveRows() == expected, "MOR read wrong with pending chain")

    // maintenance folds the whole chain: no delete files survive, the
    // scan's delete-probe set is empty, and answers are unchanged
    sql("CALL eqspec.system.rewrite_deletes('demo.e15')")
    val after = st.head().get
    assert(after.deleteFiles.isEmpty,
      s"delete files survived maintenance: ${after.deleteFiles.size}")
    assert(liveRows() == expected, "answers changed by rewrite_deletes")
    assert(after.totalRows == 4 + 10,
      s"totalRows=${after.totalRows} after fold, expected 14")

    // and compaction shrinks the 100 tiny upsert files to O(1) data files
    sql("CALL eqspec.system.compact('demo.e15')")
    val compacted = st.head().get
    assert(compacted.files.size < before.files.size / 10,
      s"compaction left ${compacted.files.size} files " +
        s"(was ${before.files.size})")
    assert(liveRows() == expected, "answers changed by compaction")
  }
}
