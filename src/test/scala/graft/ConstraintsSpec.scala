package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Enforced CHECK constraints (SUPPORT_TABLE_CONSTRAINT): ADD CONSTRAINT
  * validates existing rows, writes that violate fail, NULL predicates
  * pass (SQL CHECK semantics), DROP CONSTRAINT lifts enforcement, and the
  * direct-API upsert path enforces too.
  */
class ConstraintsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-ck-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.ckspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.ckspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS ckspec.demo")
  }

  test("INSERT violating an enforced CHECK fails; valid rows commit") {
    sql("CREATE TABLE ckspec.demo.t1 (id INT, v INT) USING graft")
    sql("INSERT INTO ckspec.demo.t1 VALUES (1, 10)")
    sql("ALTER TABLE ckspec.demo.t1 ADD CONSTRAINT pos CHECK (v > 0)")
    sql("INSERT INTO ckspec.demo.t1 VALUES (2, 20)") // fine
    val e = intercept[Exception] {
      sql("INSERT INTO ckspec.demo.t1 VALUES (3, -5)")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .toLowerCase.contains("pos"))
    // the failed insert must not have committed anything
    assert(sql("SELECT count(*) FROM ckspec.demo.t1")
      .collect().head.getLong(0) == 2)
  }

  test("NULL predicate passes (SQL CHECK semantics)") {
    sql("CREATE TABLE ckspec.demo.t2 (id INT, v INT) USING graft")
    sql("ALTER TABLE ckspec.demo.t2 ADD CONSTRAINT pos CHECK (v > 0)")
    sql("INSERT INTO ckspec.demo.t2 VALUES (1, NULL)") // NULL -> passes
    assert(sql("SELECT count(*) FROM ckspec.demo.t2")
      .collect().head.getLong(0) == 1)
  }

  test("ADD CONSTRAINT validates existing rows and refuses violations") {
    sql("CREATE TABLE ckspec.demo.t3 (id INT, v INT) USING graft")
    sql("INSERT INTO ckspec.demo.t3 VALUES (1, -1)")
    val e = intercept[Exception] {
      sql("ALTER TABLE ckspec.demo.t3 ADD CONSTRAINT pos CHECK (v > 0)")
    }
    // Spark's analyzer validates existing data itself
    // (NEW_CHECK_CONSTRAINT_VIOLATION) before our alterTable-side check
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("CHECK_CONSTRAINT_VIOLATION"))
    // constraint must NOT have been recorded
    val st = new SnapshotStore(Paths.get(wh, "demo", "t3"))
    assert(st.head().get.checks.isEmpty)
  }

  test("DROP CONSTRAINT lifts enforcement") {
    sql("CREATE TABLE ckspec.demo.t4 (id INT, v INT) USING graft")
    sql("ALTER TABLE ckspec.demo.t4 ADD CONSTRAINT pos CHECK (v > 0)")
    sql("ALTER TABLE ckspec.demo.t4 DROP CONSTRAINT pos")
    sql("INSERT INTO ckspec.demo.t4 VALUES (1, -9)") // now fine
    assert(sql("SELECT count(*) FROM ckspec.demo.t4")
      .collect().head.getLong(0) == 1)
  }

  test("direct-API upsert enforces CHECK constraints too") {
    sql("""CREATE TABLE ckspec.demo.t5 (id INT, v INT) USING graft
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("ALTER TABLE ckspec.demo.t5 ADD CONSTRAINT pos CHECK (v > 0)")
    sql("INSERT INTO ckspec.demo.t5 VALUES (1, 1)")
    val st = new SnapshotStore(Paths.get(wh, "demo", "t5"))
    val e = intercept[Exception] {
      Upsert.into(spark, st,
        spark.sql("SELECT * FROM VALUES (1, -2) AS t(id, v)"), Seq("id"))
    }
    assert(e.getMessage.contains("pos") ||
      Option(e.getCause).exists(_.getMessage.contains("pos")))
    assert(sql("SELECT v FROM ckspec.demo.t5").collect().map(_.getInt(0)).toSeq
      == Seq(1), "failed upsert must not change the table")
  }

  test("UPDATE that would break the constraint fails") {
    sql("CREATE TABLE ckspec.demo.t6 (id INT, v INT) USING graft")
    sql("INSERT INTO ckspec.demo.t6 VALUES (1, 5)")
    sql("ALTER TABLE ckspec.demo.t6 ADD CONSTRAINT pos CHECK (v > 0)")
    val e = intercept[Exception] {
      sql("UPDATE ckspec.demo.t6 SET v = -1 WHERE id = 1")
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .toLowerCase.contains("pos"))
    assert(sql("SELECT v FROM ckspec.demo.t6").collect().head.getInt(0) == 5)
  }
}
