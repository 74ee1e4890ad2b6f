package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Dynamic partition overwrite (`partitionOverwriteMode=dynamic`):
  * INSERT OVERWRITE replaces exactly the partitions present in the
  * incoming data — a metadata-only swap against the staged files'
  * partition tuples, never a read of the previous table data.
  */
class DynamicOverwriteSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-dyn-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.dyn", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.dyn.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS dyn.t")
    s
  }

  private def withDynamicMode[A](body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try body finally spark.conf.set(key, prev)
  }

  test("overwrites only the partitions the new data lands in") {
    spark.sql("""CREATE TABLE dyn.t.sales (id INT, amt DOUBLE, day STRING)
                 USING iceberg PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO dyn.t.sales VALUES
                 (1, 10.0, 'mon'), (2, 20.0, 'mon'),
                 (3, 30.0, 'tue'), (4, 40.0, 'wed')""")

    withDynamicMode {
      spark.sql("""INSERT OVERWRITE dyn.t.sales VALUES
                   (9, 99.0, 'mon'), (10, 100.0, 'thu')""")
    }

    val rows = spark.sql("SELECT id, amt, day FROM dyn.t.sales ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getString(2))).toSeq
    // 'mon' fully replaced, 'thu' added, 'tue'/'wed' untouched
    assert(rows == Seq((3, 30.0, "tue"), (4, 40.0, "wed"),
      (9, 99.0, "mon"), (10, 100.0, "thu")))

    val head = new SnapshotStore(Paths.get(wh, "t", "sales")).head().get
    assert(head.operation == "overwrite")
    assert(head.summary("replaced-partitions").toInt == 2) // mon + thu
    assert(head.summary("replaced-files").toInt >= 1)
  }

  test("unpartitioned table: dynamic overwrite replaces everything") {
    spark.sql("CREATE TABLE dyn.t.flat (id INT, v STRING) USING iceberg")
    spark.sql("INSERT INTO dyn.t.flat VALUES (1, 'a'), (2, 'b')")
    withDynamicMode {
      spark.sql("INSERT OVERWRITE dyn.t.flat VALUES (3, 'c')")
    }
    val rows = spark.sql("SELECT id, v FROM dyn.t.flat").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((3, "c")))
  }

  test("static mode is unaffected: INSERT OVERWRITE still truncates") {
    spark.sql("""CREATE TABLE dyn.t.stat (id INT, day STRING)
                 USING iceberg PARTITIONED BY (day)""")
    spark.sql("INSERT INTO dyn.t.stat VALUES (1, 'mon'), (2, 'tue')")
    spark.sql("INSERT OVERWRITE dyn.t.stat VALUES (3, 'wed')")
    val rows = spark.sql("SELECT id, day FROM dyn.t.stat").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((3, "wed")))
  }

  test("dynamic overwrite on a bucket partition matches staged tuples") {
    spark.sql("""CREATE TABLE dyn.t.bkt (id INT, v STRING)
                 USING iceberg PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO dyn.t.bkt VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    withDynamicMode {
      // id=2 lands in some bucket B; every prior row of bucket B is
      // replaced, rows in other buckets survive
      spark.sql("INSERT OVERWRITE dyn.t.bkt VALUES (2, 'B!')")
    }
    val rows = spark.sql("SELECT id, v FROM dyn.t.bkt ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    // row-side bucket(id) must equal the staged writer's pmod(hash(id),4):
    // exactly the prior rows sharing id=2's bucket are replaced
    val expected = Seq(1 -> "a", 3 -> "c").filterNot(kv =>
      sameBucket(kv._1, 2, 4)) :+ (2 -> "B!")
    assert(rows == expected.sortBy(_._1), s"got $rows")
  }

  /** pmod(murmur3(int, seed=42), n) — the staged writer's bucket value. */
  private def sameBucket(a: Int, b: Int, n: Int): Boolean = {
    def bk(x: Int): Int = {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(x, org.apache.spark.sql.types.IntegerType, 42L).toInt
      ((h % n) + n) % n
    }
    bk(a) == bk(b)
  }

  test("dynamic overwrite on a transformed partition (days of timestamp)") {
    spark.sql("""CREATE TABLE dyn.t.ev (id INT, ts TIMESTAMP)
                 USING iceberg PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO dyn.t.ev VALUES
                 (1, timestamp'2024-01-01 10:00:00'),
                 (2, timestamp'2024-01-02 11:00:00')""")
    withDynamicMode {
      spark.sql("""INSERT OVERWRITE dyn.t.ev VALUES
                   (3, timestamp'2024-01-02 23:00:00')""")
    }
    val rows = spark.sql("SELECT id FROM dyn.t.ev ORDER BY id").collect()
      .map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 3)) // day 2024-01-02 replaced, 2024-01-01 kept
  }
}
