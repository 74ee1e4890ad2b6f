package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Regressions from the round-2 self-review: each test pins a bug that
  * produced silently-wrong results (not errors) in the lakehouse paths. */
class ReviewRegressionSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-rr-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.rr", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.rr.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS rr.t")
    s
  }

  test("string identity partitions compare lexicographically, not numerically") {
    spark.sql("""CREATE TABLE rr.t.codes (id INT, code STRING)
                 USING iceberg PARTITIONED BY (code)""")
    spark.sql("INSERT INTO rr.t.codes VALUES (1, '9'), (2, '10')")
    // Spark string semantics: '9' > '10' lexicographically — the '9'
    // partition MUST survive the predicate
    val rows = spark.sql("SELECT id FROM rr.t.codes WHERE code > '10'")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1), s"got $rows — string partition pruned numerically")
    // and an INT identity partition still compares numerically
    spark.sql("""CREATE TABLE rr.t.nums (id INT, n INT)
                 USING iceberg PARTITIONED BY (n)""")
    spark.sql("INSERT INTO rr.t.nums VALUES (1, 9), (2, 10)")
    val nrows = spark.sql("SELECT id FROM rr.t.nums WHERE n < 10")
      .collect().map(_.getInt(0)).toSeq
    assert(nrows == Seq(1), s"got $nrows")
  }

  test("dynamic overwrite on an identity timestamp partition replaces exactly") {
    spark.sql("""CREATE TABLE rr.t.ts (id INT, t TIMESTAMP)
                 USING iceberg PARTITIONED BY (t)""")
    spark.sql("""INSERT INTO rr.t.ts VALUES
                 (1, timestamp'2024-01-01 00:00:00'),
                 (2, timestamp'2024-01-02 00:00:00')""")
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try spark.sql("""INSERT OVERWRITE rr.t.ts VALUES
                     (9, timestamp'2024-01-01 00:00:00')""")
    finally spark.conf.set(key, prev)
    val rows = spark.sql("SELECT id FROM rr.t.ts ORDER BY id")
      .collect().map(_.getInt(0)).toSeq
    // the 2024-01-01 partition replaced (no duplicate id=1), 01-02 kept
    assert(rows == Seq(2, 9), s"got $rows")
  }

  test("rename does not bypass the partition-source drop/retype guards") {
    spark.sql("""CREATE TABLE rr.t.g (id INT, region STRING)
                 USING iceberg PARTITIONED BY (region)""")
    spark.sql("ALTER TABLE rr.t.g RENAME COLUMN region TO zone")
    intercept[Exception] {
      spark.sql("ALTER TABLE rr.t.g DROP COLUMN zone")
    }
  }

  test("drop then re-add a column does not resurrect old values") {
    spark.sql("CREATE TABLE rr.t.d (id INT, c INT) USING iceberg")
    spark.sql("INSERT INTO rr.t.d VALUES (1, 100)")
    spark.sql("ALTER TABLE rr.t.d DROP COLUMN c")
    spark.sql("ALTER TABLE rr.t.d ADD COLUMN c STRING")
    val r = spark.sql("SELECT id, c FROM rr.t.d").collect()(0)
    assert(r.getInt(0) == 1 && r.isNullAt(1),
      "re-added column leaked dropped values (or crashed on type change)")
  }

  test("non-UTC session: staged and row-side days() partition values agree") {
    val tzKey = "spark.sql.session.timeZone"
    val prevTz = spark.conf.get(tzKey)
    spark.conf.set(tzKey, "America/Los_Angeles")
    try {
      spark.sql("""CREATE TABLE rr.t.tz (id INT, ts TIMESTAMP)
                   USING iceberg PARTITIONED BY (days(ts))""")
      // 23:00 PST is the NEXT day in UTC — a UTC-computing row-side
      // writer lands it in the wrong partition
      spark.sql("""INSERT INTO rr.t.tz VALUES
                   (1, timestamp'2024-01-02 23:00:00'),
                   (2, timestamp'2024-01-03 01:00:00')""")
      // COW rewrite runs the ROW-SIDE writer over both rows
      spark.sql("UPDATE rr.t.tz SET id = id + 10")
      val store = new SnapshotStore(java.nio.file.Paths.get(wh, "t", "tz"))
      val pvs = store.head().get.files
        .flatMap(_.partitionValues.get("days(ts)")).sorted
      assert(pvs == Seq("2024-01-02", "2024-01-03"),
        s"row-side day partition diverged from session tz: $pvs")
      val rows = spark.sql(
        "SELECT id FROM rr.t.tz WHERE ts < timestamp'2024-01-03 00:00:00'")
        .collect().map(_.getInt(0)).toSeq
      assert(rows == Seq(11), s"got $rows")
    } finally spark.conf.set(tzKey, prevTz)
  }

  test("expire_snapshots keeps tag-pinned versions") {
    spark.sql("CREATE TABLE rr.t.e (id INT) USING iceberg")
    spark.sql("INSERT INTO rr.t.e VALUES (1)") // v2
    spark.sql("CALL rr.system.create_tag('t.e', 'keepme', 2)")
    spark.sql("INSERT INTO rr.t.e VALUES (2)") // v3
    spark.sql("INSERT INTO rr.t.e VALUES (3)") // v4
    spark.sql("INSERT INTO rr.t.e VALUES (4)") // v5
    spark.sql("CALL rr.system.expire_snapshots('t.e', 2)")
    // v2 is outside keep_last=2 but pinned by the tag — still readable
    val rows = spark.sql("SELECT * FROM rr.t.e VERSION AS OF 'keepme'")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1), "tag-pinned snapshot was expired")
  }

  test("tag names that cannot round-trip are rejected at creation") {
    spark.sql("CREATE TABLE rr.t.tn (id INT) USING iceberg")
    intercept[Exception] {
      spark.sql("CALL rr.system.create_tag('t.tn', 'rel=1.2', 1)")
    }
    intercept[Exception] {
      spark.sql("CALL rr.system.create_tag('t.tn', '../escape', 1)")
    }
  }
}
