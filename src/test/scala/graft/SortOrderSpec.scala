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

  test("zorder sort-order clusters files on BOTH dimensions") {
    spark.sql("""CREATE TABLE so.t.zed (x INT, y INT) USING iceberg
                 TBLPROPERTIES ('graft.sort-order' = 'zorder(x, y)')""")
    // a 64x64 grid in shuffled order: a linear sort on x would leave every
    // file spanning the full y range; z-ordering bounds both
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try spark.sql("""INSERT INTO so.t.zed
                 SELECT CAST(pmod(hash(id), 64) AS INT),
                        CAST(pmod(hash(id + 9999), 64) AS INT)
                 FROM range(0, 8192)""")
    finally spark.conf.set(coalesceKey, prevCoalesce)

    val head = new SnapshotStore(Paths.get(wh, "t", "zed")).head().get
    assert(head.files.size > 3, s"need several files, got ${head.files.size}")
    def spanFraction(colName: String): Double = {
      val spans = head.files.flatMap(_.stats.get(colName)
        .flatMap(s => s.min.zip(s.max))
        .map { case (mn, mx) => (mx.toLong - mn.toLong + 1).toDouble / 64.0 })
      spans.sum / spans.size
    }
    // every file must cover a PROPER sub-range of both dimensions on
    // average — an unclustered write gives ~1.0 on both; a linear sort
    // gives ~1.0 on y. Z-order should bound both well below full span.
    val fx = spanFraction("x")
    val fy = spanFraction("y")
    assert(fx < 0.8 && fy < 0.8, f"x span $fx%.2f, y span $fy%.2f")

    // both dimensions actually prune files
    val prunedX = StatsPruner.prune(head.files,
      Seq(org.apache.spark.sql.sources.EqualTo("x", 7)), head.partitionSpec)
    val prunedY = StatsPruner.prune(head.files,
      Seq(org.apache.spark.sql.sources.EqualTo("y", 50)), head.partitionSpec)
    assert(prunedX.size < head.files.size, "x predicate pruned nothing")
    assert(prunedY.size < head.files.size, "y predicate pruned nothing")

    assert(spark.table("so.t.zed").count() == 8192)
  }

  test("zorder key interleaving is order-preserving per column") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.functions.col
    val zkey = ColumnBridge.column(graft.functions.ZOrderKey(Seq(
      ColumnBridge.expression(col("x")), ColumnBridge.expression(col("y")))))
    val rows = spark.range(0, 100).selectExpr(
        "CAST(id % 10 AS INT) AS x", "CAST(id DIV 10 AS INT) AS y")
      .select(col("x"), col("y"), zkey.as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // fixing y, z grows with x; fixing x, z grows with y
    for (y <- 0 until 10; x <- 1 until 10)
      assert(rows((x, y)) > rows((x - 1, y)), s"x-order broken at ($x,$y)")
    for (x <- 0 until 10; y <- 1 until 10)
      assert(rows((x, y)) > rows((x, y - 1)), s"y-order broken at ($x,$y)")
  }

  test("sort-order referencing a missing column fails the write loudly") {
    spark.sql("""CREATE TABLE so.t.bad (id INT) USING iceberg
                 TBLPROPERTIES ('graft.sort-order' = 'nope')""")
    intercept[Exception] {
      spark.sql("INSERT INTO so.t.bad VALUES (1)")
    }
  }
}
