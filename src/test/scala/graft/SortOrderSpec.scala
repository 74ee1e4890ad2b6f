package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Write-time clustering via the `graft.sort-order` table property:
  * inserts range-repartition on the sort keys, so each data file covers a
  * narrow, mostly-disjoint key range and min/max stats prune effectively —
  * the property that makes stats pruning work at scale rather than merely
  * exist. */
class SortOrderSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-so-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.so", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.so.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS so.t")
    s
  }

  test("sorted table writes range-disjoint files that prune to one file") {
    spark.sql("""CREATE TABLE so.t.sorted (id INT, v INT) USING iceberg
                 TBLPROPERTIES ('graft.sort-order' = 'v')""")
    // shuffled input: without clustering every file would span ~the full
    // v range and nothing could prune. (AQE would coalesce these
    // kilobyte-scale range partitions into one — correct for real data
    // sizes, defeats the multi-file assertion here — so pin it off.)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.sql("""INSERT INTO so.t.sorted
                 SELECT CAST(id AS INT), CAST(hash(id) % 1000 AS INT)
                 FROM range(0, 4000)""")
    finally spark.conf.set(coalesceKey, prevCoalesce)

    val head = new SnapshotStore(Paths.get(wh, "t", "sorted")).head().get
    assert(head.files.size > 1, "need multiple files to test disjointness")
    val ranges = head.files.flatMap { f =>
      f.stats.get("v").flatMap(s => s.min.zip(s.max))
        .map { case (mn, mx) => (mn.toLong, mx.toLong) }
    }
    assert(ranges.size == head.files.size, "every file has v stats")
    // ranges pairwise disjoint (range partitioning puts boundary keys in
    // one partition, so strict disjointness holds between distinct files)
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping file ranges: $sorted")
      case _ =>
    }

    // a point predicate must prune to at most 2 files (1 + boundary dup)
    val pruned = StatsPruner.prune(head.files,
      Seq(org.apache.spark.sql.sources.EqualTo("v", 500)), head.partitionSpec)
    assert(pruned.size <= 2, s"point query read ${pruned.size} files")

    // and the data itself is intact
    assert(spark.table("so.t.sorted").count() == 4000)
  }

  test("sort-order referencing a missing column fails the write loudly") {
    spark.sql("""CREATE TABLE so.t.bad (id INT) USING iceberg
                 TBLPROPERTIES ('graft.sort-order' = 'nope')""")
    intercept[Exception] {
      spark.sql("INSERT INTO so.t.bad VALUES (1)")
    }
  }
}
