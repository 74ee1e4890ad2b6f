package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Batch CDC over the snapshot log (Changes.between): appends surface as
  * inserts, COW deletes as net deletes, compaction as an empty changelog;
  * an expired parent fails loudly instead of producing a wrong diff. */
class ChangesSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-cdc-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.cdc", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.cdc.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS cdc.t")
    s
  }

  private def store(tbl: String) =
    new SnapshotStore(Paths.get(wh, "t", tbl))

  test("appends produce inserts tagged with their commit version") {
    spark.sql("CREATE TABLE cdc.t.a (id INT, v STRING) USING iceberg")
    spark.sql("INSERT INTO cdc.t.a VALUES (1, 'x'), (2, 'y')") // v2
    spark.sql("INSERT INTO cdc.t.a VALUES (3, 'z')")           // v3

    val ch = Changes.between(spark, store("a"), 1L, 3L)
      .select("id", Changes.ChangeType, Changes.CommitVersion)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted
    assert(ch.toSeq == Seq((1, "insert", 2L), (2, "insert", 2L), (3, "insert", 3L)))
  }

  test("COW delete nets out to exactly the deleted rows") {
    spark.sql("CREATE TABLE cdc.t.b (id INT) USING iceberg")
    spark.sql("INSERT INTO cdc.t.b VALUES (1), (2), (3), (4)") // v2
    spark.sql("DELETE FROM cdc.t.b WHERE id % 2 = 0")          // v3 rewrite

    val ch = Changes.between(spark, store("b"), 2L, 3L)
      .select("id", Changes.ChangeType)
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(ch.toSeq == Seq((2, "delete"), (4, "delete")))
  }

  test("compaction (pure rewrite) yields an empty net changelog") {
    spark.sql("CREATE TABLE cdc.t.c (id INT) USING iceberg")
    spark.sql("INSERT INTO cdc.t.c VALUES (1)") // v2
    spark.sql("INSERT INTO cdc.t.c VALUES (2)") // v3
    spark.sql("CALL cdc.system.compact('t.c')") // v4 replace
    assert(store("c").currentVersion().contains(4L))

    assert(Changes.between(spark, store("c"), 3L, 4L).isEmpty)
    // raw (non-net) view still exposes the file churn for auditing
    val raw = Changes.between(spark, store("c"), 3L, 4L, net = false)
    assert(raw.count() == 4) // 2 deletes (old files) + 2 inserts (new file)
  }

  test("changelog across schema evolution null-fills old commits") {
    spark.sql("CREATE TABLE cdc.t.d (id INT) USING iceberg")
    spark.sql("INSERT INTO cdc.t.d VALUES (1)") // v2
    spark.sql("ALTER TABLE cdc.t.d ADD COLUMN tag STRING") // v3 evolve
    spark.sql("INSERT INTO cdc.t.d VALUES (2, 'new')") // v4

    val ch = Changes.between(spark, store("d"), 1L, 4L)
      .select("id", "tag", Changes.ChangeType)
      .collect().map(r => (r.getInt(0), Option(r.getString(1)), r.getString(2)))
      .sortBy(_._1)
    assert(ch.toSeq == Seq((1, None, "insert"), (2, Some("new"), "insert")))
  }

  test("MAP columns degrade net mode to the raw changelog, not a failure") {
    spark.sql("CREATE TABLE cdc.t.m (id INT, tags MAP<STRING, STRING>) USING iceberg")
    spark.sql("INSERT INTO cdc.t.m SELECT 1, map('a', 'b')") // v2
    spark.sql("INSERT INTO cdc.t.m SELECT 2, map('c', 'd')") // v3
    spark.sql("CALL cdc.system.compact('t.m')")              // v4 replace
    // net would need exceptAll over a MAP — must fall back, not throw
    val raw = Changes.between(spark, store("m"), 3L, 4L)
    assert(raw.count() == 4) // 2 deletes + 2 inserts, carryover visible
  }

  test("expired parent fails loudly") {
    spark.sql("CREATE TABLE cdc.t.e (id INT) USING iceberg")
    (1 to 5).foreach(i => spark.sql(s"INSERT INTO cdc.t.e VALUES ($i)")) // v2..v6
    spark.sql("CALL cdc.system.expire_snapshots('t.e', 2)") // keeps v5, v6
    val ex = intercept[IllegalStateException] {
      Changes.between(spark, store("e"), 3L, 6L).collect()
    }
    assert(ex.getMessage.contains("expired"))
  }
}
