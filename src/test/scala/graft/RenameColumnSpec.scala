package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Column rename via column-mapping-by-name: data files keep the original
  * PHYSICAL column name forever; RENAME swaps only the logical name in
  * schema metadata. Files written before and after the rename must stay
  * interchangeable on every path — vectorized scan, stats pruning,
  * COW rewrites, compaction — and a re-added column with the retired name
  * must NOT leak the old column's values. */
class RenameColumnSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-ren-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.ren", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.ren.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS ren.t")
    s
  }

  test("files before and after a rename read back as one table") {
    spark.sql("CREATE TABLE ren.t.r1 (id INT, amount DOUBLE) USING iceberg")
    spark.sql("INSERT INTO ren.t.r1 VALUES (1, 1.5), (2, 2.5)")
    spark.sql("ALTER TABLE ren.t.r1 RENAME COLUMN amount TO total")
    spark.sql("INSERT INTO ren.t.r1 VALUES (3, 3.5)")

    assert(spark.table("ren.t.r1").columns.toSeq == Seq("id", "total"))
    val rows = spark.sql("SELECT id, total FROM ren.t.r1 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1, 1.5), (2, 2.5), (3, 3.5)))

    // filtering on the renamed column: correct rows AND correct pruning
    // (stats of pre-rename files are keyed by the physical name)
    val hit = spark.sql("SELECT id FROM ren.t.r1 WHERE total > 3.0")
      .collect().map(_.getInt(0)).toSeq
    assert(hit == Seq(3))
  }

  test("COW rewrite (UPDATE/DELETE) works across a rename") {
    spark.sql("CREATE TABLE ren.t.r2 (id INT, v STRING) USING iceberg")
    spark.sql("INSERT INTO ren.t.r2 VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE ren.t.r2 RENAME COLUMN v TO label")
    spark.sql("UPDATE ren.t.r2 SET label = 'A' WHERE id = 1")
    spark.sql("INSERT INTO ren.t.r2 VALUES (3, 'c')")
    spark.sql("DELETE FROM ren.t.r2 WHERE label = 'b'")
    val rows = spark.sql("SELECT id, label FROM ren.t.r2 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "A"), (3, "c")))
  }

  test("re-adding a column under a retired name does not leak old values") {
    spark.sql("CREATE TABLE ren.t.r3 (id INT, score INT) USING iceberg")
    spark.sql("INSERT INTO ren.t.r3 VALUES (1, 100)")
    spark.sql("ALTER TABLE ren.t.r3 RENAME COLUMN score TO old_score")
    spark.sql("ALTER TABLE ren.t.r3 ADD COLUMN score INT")
    val r = spark.sql("SELECT id, old_score, score FROM ren.t.r3").collect()(0)
    assert(r.getInt(1) == 100)
    assert(r.isNullAt(2), "new 'score' column leaked values of the renamed-away one")
  }

  test("rename of a partition source column keeps pruning and writes intact") {
    spark.sql("""CREATE TABLE ren.t.r4 (id INT, region STRING)
                 USING iceberg PARTITIONED BY (region)""")
    spark.sql("INSERT INTO ren.t.r4 VALUES (1, 'eu'), (2, 'us')")
    spark.sql("ALTER TABLE ren.t.r4 RENAME COLUMN region TO zone")
    spark.sql("INSERT INTO ren.t.r4 VALUES (3, 'eu')")
    val rows = spark.sql("SELECT id FROM ren.t.r4 WHERE zone = 'eu' ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 3))
    // partition pruning on the renamed source: 'us' file untouched
    val store = new SnapshotStore(Paths.get(wh, "t", "r4"))
    val head = store.head().get
    assert(head.files.forall(_.partitionValues.keys.forall(_ == "region")),
      "partition values stay keyed by the physical name")
  }

  test("time travel shows each snapshot's own column names") {
    spark.sql("CREATE TABLE ren.t.r5 (id INT, a STRING) USING iceberg")
    spark.sql("INSERT INTO ren.t.r5 VALUES (1, 'x')")
    spark.sql("ALTER TABLE ren.t.r5 RENAME COLUMN a TO b")
    assert(spark.sql("SELECT * FROM ren.t.r5 VERSION AS OF 2").columns.toSeq
      == Seq("id", "a"))
    assert(spark.table("ren.t.r5").columns.toSeq == Seq("id", "b"))
  }

  test("compaction across a rename preserves data") {
    spark.sql("CREATE TABLE ren.t.r6 (id INT, x DOUBLE) USING iceberg")
    spark.sql("INSERT INTO ren.t.r6 VALUES (1, 0.5)")
    spark.sql("INSERT INTO ren.t.r6 VALUES (2, 1.5)")
    spark.sql("ALTER TABLE ren.t.r6 RENAME COLUMN x TO y")
    spark.sql("INSERT INTO ren.t.r6 VALUES (3, 2.5)")
    spark.sql("CALL ren.system.compact('t.r6')")
    val rows = spark.sql("SELECT id, y FROM ren.t.r6 ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(rows == Seq((1, 0.5), (2, 1.5), (3, 2.5)))
  }
}
