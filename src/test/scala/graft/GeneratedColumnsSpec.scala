package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** GENERATED ALWAYS AS columns: computed at every batch write (the one
  * choke point), overriding incoming values; partitioning on a generated
  * column is the clean spelling of the reference's derived-partitioning
  * intent (`PARTITIONED BY (CAST(created_at AS DATE))`,
  * `warehouse_helpers.py:48`, SURVEY.md §2.11.2).
  */
class GeneratedColumnsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-gen-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.genspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.genspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS genspec.demo")
  }

  test("INSERT computes generated columns") {
    sql("""CREATE TABLE genspec.demo.g1
           (id INT, day DATE, y INT GENERATED ALWAYS AS (year(day)))
           USING graft""")
    sql("""INSERT INTO genspec.demo.g1 (id, day) VALUES
           (1, DATE '2024-03-01'), (2, DATE '2025-11-30')""")
    val rows = sql("SELECT id, y FROM genspec.demo.g1 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 2024), (2, 2025)))
    // the generation expression persists in the snapshot
    val st = new SnapshotStore(Paths.get(wh, "demo", "g1"))
    assert(st.head().get.generated == Map("y" -> "year(day)"))
  }

  test("partitioning on a generated column prunes like hidden partitioning") {
    sql("""CREATE TABLE genspec.demo.g2
           (id INT, ts TIMESTAMP,
            d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
           USING graft PARTITIONED BY (d)""")
    sql("""INSERT INTO genspec.demo.g2 (id, ts) VALUES
           (1, TIMESTAMP '2024-01-01 10:00:00'),
           (2, TIMESTAMP '2024-01-02 11:00:00'),
           (3, TIMESTAMP '2024-01-02 23:59:59')""")
    val st = new SnapshotStore(Paths.get(wh, "demo", "g2"))
    val head = st.head().get
    assert(head.files.map(_.partitionValues("d")).toSet ==
      Set("2024-01-01", "2024-01-02"))
    val ids = sql("SELECT id FROM genspec.demo.g2 WHERE d = DATE '2024-01-02' ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(2, 3))
  }

  test("DELETE works; UPDATE on generated-column tables fails loudly") {
    sql("""CREATE TABLE genspec.demo.g3
           (id INT, v INT, v2 INT GENERATED ALWAYS AS (v * 2))
           USING graft""")
    sql("INSERT INTO genspec.demo.g3 (id, v) VALUES (1, 10), (2, 20)")
    sql("DELETE FROM genspec.demo.g3 WHERE id = 1")
    assert(sql("SELECT v2 FROM genspec.demo.g3").collect().head.getInt(0) == 40)
    val e = intercept[Exception] {
      sql("UPDATE genspec.demo.g3 SET v = 99 WHERE id = 2")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("GENERATED"))
    assert(sql("SELECT v FROM genspec.demo.g3").collect().head.getInt(0) == 20)
  }

  test("INSERT OVERWRITE recomputes generation expressions") {
    sql("""CREATE TABLE genspec.demo.g4
           (id INT, v INT, neg INT GENERATED ALWAYS AS (-v))
           USING graft""")
    sql("INSERT INTO genspec.demo.g4 (id, v) VALUES (1, 5)")
    sql("INSERT OVERWRITE genspec.demo.g4 (id, v) VALUES (2, 7)")
    val r = sql("SELECT id, neg FROM genspec.demo.g4").collect()
    assert(r.length == 1 && r.head.getInt(0) == 2 && r.head.getInt(1) == -7)
  }
}
