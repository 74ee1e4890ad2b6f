package graft

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Column DEFAULT values (SUPPORT_COLUMN_DEFAULT_VALUE): INSERT fills
  * omitted columns with CURRENT_DEFAULT, and files written BEFORE an
  * ADD COLUMN ... DEFAULT read the column as EXISTS_DEFAULT, not null —
  * including through the COW rewrite reader (UPDATE/MERGE must not turn
  * defaults into nulls).
  */
class DefaultValuesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-dflt-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.dfspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dfspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS dfspec.demo")
  }

  test("CREATE TABLE with DEFAULT: INSERT without the column fills it") {
    sql("""CREATE TABLE dfspec.demo.t1
           (id INT, status STRING DEFAULT 'new', score INT DEFAULT 100)
           USING graft""")
    sql("INSERT INTO dfspec.demo.t1 (id) VALUES (1)")
    sql("INSERT INTO dfspec.demo.t1 VALUES (2, 'done', 7)")
    sql("INSERT INTO dfspec.demo.t1 (id, status) VALUES (3, DEFAULT)")
    val rows = sql("SELECT id, status, score FROM dfspec.demo.t1 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, "new", 100), (2, "done", 7), (3, "new", 100)))
  }

  test("ADD COLUMN DEFAULT: old files read the default, new inserts too") {
    sql("CREATE TABLE dfspec.demo.t2 (id INT) USING graft")
    sql("INSERT INTO dfspec.demo.t2 VALUES (1), (2)")
    sql("ALTER TABLE dfspec.demo.t2 ADD COLUMN region STRING DEFAULT 'emea'")
    sql("INSERT INTO dfspec.demo.t2 VALUES (3, 'apac')")
    sql("INSERT INTO dfspec.demo.t2 (id) VALUES (4)")
    val rows = sql("SELECT id, region FROM dfspec.demo.t2 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "emea"), (2, "emea"), (3, "apac"), (4, "emea")),
      "pre-existing rows must read the EXISTS_DEFAULT, not null")
  }

  test("COW UPDATE preserves exists-defaults for pre-column files") {
    sql("CREATE TABLE dfspec.demo.t3 (id INT, v INT) USING graft")
    sql("INSERT INTO dfspec.demo.t3 VALUES (1, 10), (2, 20)")
    sql("ALTER TABLE dfspec.demo.t3 ADD COLUMN tag STRING DEFAULT 'x'")
    // UPDATE rewrites the old file through the COW reader: the rewritten
    // rows must materialize tag='x', not NULL
    sql("UPDATE dfspec.demo.t3 SET v = v + 1 WHERE id = 1")
    val rows = sql("SELECT id, v, tag FROM dfspec.demo.t3 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq
    assert(rows == Seq((1, 11, "x"), (2, 20, "x")))
  }

  test("non-deterministic ADD COLUMN defaults freeze at ALTER time") {
    sql("CREATE TABLE dfspec.demo.t5 (id INT) USING graft")
    sql("INSERT INTO dfspec.demo.t5 VALUES (1)")
    sql("ALTER TABLE dfspec.demo.t5 ADD COLUMN d DATE DEFAULT current_date()")
    val store = new SnapshotStore(
      java.nio.file.Paths.get(wh, "demo", "t5"))
    val f = store.head().get.schema.fields.find(_.name == "d").get
    val exists = f.metadata.getString("EXISTS_DEFAULT")
    // the exists-default must be the FOLDED date literal, not the SQL that
    // would re-evaluate (and drift) on every later read
    assert(exists.startsWith("DATE '"),
      s"EXISTS_DEFAULT should be a frozen literal, got: $exists")
    assert(sql("SELECT d FROM dfspec.demo.t5").collect().head.getDate(0) != null)
  }

  test("defaults survive snapshot JSON roundtrip and time travel") {
    sql("CREATE TABLE dfspec.demo.t4 (id INT, s STRING DEFAULT 'd0') USING graft")
    sql("INSERT INTO dfspec.demo.t4 (id) VALUES (1)")
    val store = new SnapshotStore(
      java.nio.file.Paths.get(wh, "demo", "t4"))
    val reread = Snapshot.fromJson(Snapshot.toJson(store.head().get))
    val f = reread.schema.fields.find(_.name == "s").get
    assert(f.metadata.contains("CURRENT_DEFAULT") &&
      f.metadata.getString("CURRENT_DEFAULT") == "'d0'")
    assert(sql("SELECT s FROM dfspec.demo.t4 VERSION AS OF 2")
      .collect().head.getString(0) == "d0")
  }
}
