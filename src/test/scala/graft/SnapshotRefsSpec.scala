package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Named snapshot refs (tags) + rollback: `CALL create_tag` pins a name to
  * a version, `VERSION AS OF 'name'` resolves it, and
  * `rollback_to_version` makes the head a NEW auditable snapshot with the
  * old content (history intact). */
class SnapshotRefsSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-refs-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.refs", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.refs.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS refs.t")
    s
  }

  test("tag a version and time-travel to it by name") {
    spark.sql("CREATE TABLE refs.t.a (id INT) USING iceberg")
    spark.sql("INSERT INTO refs.t.a VALUES (1)") // v2
    spark.sql("CALL refs.system.create_tag('t.a', 'golden', 2)")
    spark.sql("INSERT INTO refs.t.a VALUES (2)") // v3

    assert(spark.sql("SELECT * FROM refs.t.a VERSION AS OF 'golden'")
      .collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(spark.table("refs.t.a").count() == 2)

    spark.sql("CALL refs.system.drop_tag('t.a', 'golden')")
    intercept[Exception] {
      spark.sql("SELECT * FROM refs.t.a VERSION AS OF 'golden'").collect()
    }
  }

  test("rollback_to_version restores content as a new snapshot") {
    spark.sql("CREATE TABLE refs.t.b (id INT) USING iceberg")
    spark.sql("INSERT INTO refs.t.b VALUES (1)") // v2
    spark.sql("INSERT INTO refs.t.b VALUES (2)") // v3
    spark.sql("CALL refs.system.rollback_to_version('t.b', 2)")

    assert(spark.table("refs.t.b").collect().map(_.getInt(0)).toSeq == Seq(1))
    // history intact: the pre-rollback snapshot is still reachable
    assert(spark.sql("SELECT * FROM refs.t.b VERSION AS OF 3")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    val ops = spark.sql(
      "SELECT operation FROM refs.t.b.snapshots ORDER BY snapshot_id")
      .collect().map(_.getString(0)).toSeq
    assert(ops.last == "rollback", s"ops=$ops")
  }

  test("tagging a missing version fails") {
    spark.sql("CREATE TABLE refs.t.c (id INT) USING iceberg")
    intercept[Exception] {
      spark.sql("CALL refs.system.create_tag('t.c', 'x', 99)")
    }
  }
}
