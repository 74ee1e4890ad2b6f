package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Partition evolution (`README.md:127-130` of the reference: change the
  * partition scheme without rewriting old data): old files keep their
  * layout and prune conservatively; files written after the evolution use
  * the new spec and prune on it. */
class PartitionEvolutionSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-pev-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.pev", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.pev.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS pev.t")
    s
  }

  test("evolve identity(region) to days(ts): both generations prune") {
    spark.sql("""CREATE TABLE pev.t.ev (region INT, ts TIMESTAMP, v INT)
                 USING iceberg PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO pev.t.ev
                 SELECT CAST(id % 3 AS INT), timestamp'2024-01-01 00:00:00', CAST(id AS INT)
                 FROM range(0, 30)""")
    spark.sql("CALL pev.system.set_partition_spec('t.ev', 'days(ts)')")
    spark.sql("""INSERT INTO pev.t.ev
                 SELECT CAST(id % 3 AS INT),
                        to_timestamp(concat('2024-02-0', CAST(1 + id % 2 AS STRING),
                                            ' 00:00:00')),
                        CAST(id AS INT)
                 FROM range(0, 30)""")

    val store = new SnapshotStore(Paths.get(wh, "t", "ev"))
    val head = store.head().get
    assert(head.partitionSpec.map(_.transform) == Seq("days"))
    // generation 1 files carry region values; generation 2 carry days(ts)
    assert(head.files.exists(_.partitionValues.contains("region")))
    assert(head.files.exists(_.partitionValues.contains("days(ts)")))

    // a days predicate prunes generation-2 files but keeps ALL gen-1 files
    val febOnly = StatsPruner.prune(head.files,
      Seq(org.apache.spark.sql.sources.EqualTo("ts",
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))),
      head.partitionSpec)
    val gen2 = head.files.filter(_.partitionValues.contains("days(ts)"))
    assert(febOnly.size < head.files.size, "nothing pruned after evolution")
    assert(gen2.exists(f => !febOnly.contains(f)), "gen-2 day pruning inactive")

    // correctness across generations is untouched
    assert(spark.table("pev.t.ev").count() == 60)
    assert(spark.sql(
      "SELECT count(*) FROM pev.t.ev WHERE ts >= timestamp'2024-02-01 00:00:00'")
      .head().getLong(0) == 30)

    // partitions metadata table shows both generations' keys
    val parts = spark.sql("SELECT partition FROM pev.t.ev.partitions").collect()
    assert(parts.length >= 3)
  }

  test("unknown source column is rejected") {
    spark.sql("CREATE TABLE pev.t.bad (x INT) USING iceberg")
    spark.sql("INSERT INTO pev.t.bad VALUES (1)")
    intercept[Exception] {
      spark.sql("CALL pev.system.set_partition_spec('t.bad', 'days(nope)')")
    }
  }

  test("bucket spec string parses and writes bucket partition values") {
    spark.sql("CREATE TABLE pev.t.bk (id BIGINT) USING iceberg")
    spark.sql("CALL pev.system.set_partition_spec('t.bk', 'bucket[4](id)')")
    spark.sql("INSERT INTO pev.t.bk SELECT id FROM range(0, 100)")
    val head = new SnapshotStore(Paths.get(wh, "t", "bk")).head().get
    assert(head.partitionSpec.map(_.transform) == Seq("bucket[4]"))
    assert(head.files.forall(_.partitionValues.contains("bucket[4](id)")))
    assert(head.files.flatMap(_.partitionValues.values).toSet.size == 4)
  }
}
