package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Vectors
import graft.lake._

/** Remaining SURVEY.md §2 inventory rows not covered by the oracle gate or
  * LakeSpec: SHOW CATALOGS (D1), config introspection (D15), arbitrary
  * SQL-string predicates (P5, `warehouse_helpers.py:70-77`), the
  * DataFrame writeTo API (S11), streaming reads over a lake table's data
  * dir, and codegen-kernel equivalence with the interpreted reference
  * implementations. */
class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-cov").toString
    spark.conf.set("spark.sql.catalog.covspec", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.covspec.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS covspec.db")
    dir
  }

  test("SHOW CATALOGS lists the registered graft catalog (D1)") {
    wh // force registration
    spark.sql("CREATE TABLE covspec.db.t0 (id INT) USING graft")
    val cats = spark.sql("SHOW CATALOGS").collect().map(_.getString(0))
    assert(cats.contains("covspec"))
  }

  test("config introspection via spark.conf (D15, warehouse_helpers.py:120-127)") {
    wh
    assert(spark.conf.get("spark.sql.catalog.covspec") ==
      classOf[GraftCatalog].getName)
    assert(spark.conf.getOption("spark.sql.catalog.covspec.warehouse").nonEmpty)
  }

  test("arbitrary SQL-string predicate via expr() (P5, warehouse_helpers.py:70-77)") {
    val df = Tables.lineitem(spark, sf)
      .filter(expr("l_quantity > 45 AND l_returnflag = 'R'"))
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
    assert(df.count() == direct.count())
  }

  test("DataFrame writeTo API appends to a lake table (S11)") {
    wh
    spark.sql("CREATE TABLE covspec.db.w (k INT, v STRING) USING graft")
    Seq((1, "x"), (2, "y")).toDF("k", "v").writeTo("covspec.db.w").append()
    assert(spark.table("covspec.db.w").count() == 2)
    Seq((3, "z")).toDF("k", "v").writeTo("covspec.db.w").append()
    assert(spark.table("covspec.db.w").count() == 3)
    // snapshot per append
    val ops = spark.sql("SELECT operation FROM covspec.db.w.snapshots")
      .collect().map(_.getString(0))
    assert(ops.count(_ == "append") == 2)
  }

  test("streaming reads over a lake table's data dir pick up appended snapshots") {
    wh
    spark.sql("CREATE TABLE covspec.db.s (k INT, v STRING) USING graft")
    spark.sql("INSERT INTO covspec.db.s VALUES (1, 'a')")
    val dataDir = Paths.get(wh, "db", "s", "data").toString
    val schema = spark.table("covspec.db.s").schema
    val stream = spark.readStream.schema(schema).parquet(dataDir)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("lake_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("cov-ck").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table("lake_stream").count() == 1)
    spark.sql("INSERT INTO covspec.db.s VALUES (2, 'b')") // new snapshot = new file
    q.processAllAvailable()
    assert(spark.table("lake_stream").count() == 2)
    q.stop()
  }

  test("codegen'd dot/norm kernels equal the interpreted higher-order forms " +
      "on random vectors") {
    val genVec = Gen.listOfN(64, Gen.chooseNum(-10.0, 10.0))
    val pairs = (0 until 20).flatMap { i =>
      for {
        a <- genVec.apply(Gen.Parameters.default, Seed(7L + i))
        b <- genVec.apply(Gen.Parameters.default, Seed(107L + i))
      } yield (a, b)
    }
    val df = pairs.toDF("a", "b")
    val diffs = df.select(
      abs(Vectors.dot(col("a"), col("b")) -
        Vectors.dotHof(col("a"), col("b"))).as("dd"),
      abs(Vectors.norm(col("a")) - Vectors.normHof(col("a"))).as("dn"))
      .agg(max("dd"), max("dn")).head()
    assert(diffs.getDouble(0) < 1e-9)
    assert(diffs.getDouble(1) < 1e-9)
  }

  test("_file metadata column exposes per-row file provenance") {
    wh
    spark.sql("CREATE TABLE covspec.db.f (id INT, d DATE) USING graft PARTITIONED BY (d)")
    spark.sql("""INSERT INTO covspec.db.f VALUES
      (1, DATE '2025-01-01'), (2, DATE '2025-01-02')""")
    val rows = spark.sql("SELECT id, _file FROM covspec.db.f ORDER BY id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    assert(rows(0).getString(1) != rows(1).getString(1)) // different partitions
    // metadata column stays hidden from SELECT *
    assert(spark.table("covspec.db.f").columns.toSeq == Seq("id", "d"))
  }

  test("approx_count_distinct stays within its rsd bound of the exact count") {
    // the RAW sketch values (the promoted query outputs the exact counts
    // plus its own in-query rsd assertion — see qApproxDistinct)
    val rows = graft.operators.TypedOps.hllSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx=$approx exact=$exact")
    }
    // and the promoted query's certified output carries the exact counts
    val cert = graft.operators.TypedOps.qApproxDistinct.fn(spark, sf).collect()
    assert(cert.map(_.getAs[Long]("exact_parts")).toSeq ==
      rows.sortBy(_.getString(0)).map(_.getAs[Long]("exact_parts")).toSeq)
    assert(cert.forall(_.getAs[Boolean]("sketch_within_rsd")))
  }

  test("t-digest percentiles stay within 1% of the exact sort-based form") {
    // the RAW sketch values (the promoted query outputs the exact form
    // plus its own in-query eps assertion — see qPercentilesTdigest)
    val approx = graft.operators.Analytics.tdigestSketch(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.operators.Analytics.qPercentiles.fn(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (p50, p90)) =>
      val (a50, a90) = approx(flag)
      assert(math.abs(a50 - p50) / p50 < 0.01, s"$flag p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 < 0.01, s"$flag p90: $a90 vs $p90")
    }
  }

  test("bucket partition transform assigns stable bucket ids (D-bucket)") {
    wh
    spark.sql("""CREATE TABLE covspec.db.b (id BIGINT, v STRING)
                 USING graft PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO covspec.db.b SELECT id, CAST(id AS STRING) FROM range(100)")
    assert(spark.table("covspec.db.b").count() == 100)
    val store = new SnapshotStore(Paths.get(wh, "db", "b"))
    val pvs = store.head().get.files.flatMap(_.partitionValues.get("bucket_4(id)"))
    assert(pvs.nonEmpty && pvs.toSet.subsetOf(Set("0", "1", "2", "3")))
    // re-inserting the same keys lands them in the same buckets
    spark.sql("INSERT INTO covspec.db.b SELECT id, 'x' FROM range(100)")
    val pvs2 = store.head().get.files.flatMap(_.partitionValues.get("bucket_4(id)"))
    assert(pvs2.toSet == pvs.toSet)
  }

  test("as-of join picks the latest right row at or before each left time") {
    import java.sql.Timestamp.{valueOf => ts}
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // exactly at a quote time
      (2L, ts("2024-01-01 09:00:00"), 200L), // before any quote
      (3L, ts("2024-01-01 12:00:00"), 300L)  // key with no quotes
    ).toDF("key", "t", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00"), 7L),
      (1L, ts("2024-01-01 10:00:00"), 8L),
      (1L, ts("2024-01-01 10:00:00"), 9L),   // tie: max value wins
      (1L, ts("2024-01-01 10:00:10"), 10L),  // after both trades
      (2L, ts("2024-01-01 09:30:00"), 20L)   // after key-2's trade
    ).toDF("qkey", "qt", "quote_id")
    val got = graft.operators.AsOf.asOfJoin(trades, quotes,
        "key", "t", "qkey", "qt", "quote_id")
      .select(col("trade_id"), col("__asof").as("asof_quote"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(100L) == 9L)  // 10:00:05 → latest ≤ is the 10:00:00 tie, max id
    assert(got(101L) == 9L)  // exactly at 10:00:00 → inclusive
    assert(got(200L) == -1L) // no quote at or before → null
    assert(got(300L) == -1L) // key never quoted → null
  }

  test("range join: window boundaries are (t, t+W] across bucket edges") {
    import java.sql.Timestamp.{valueOf => ts}
    val rows = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // anchor
      (2L, 10L, ts("2024-01-01 23:59:59")), // inside window, next bucket edge
      (3L, 10L, ts("2024-01-02 00:00:00")), // exactly +24h → inclusive
      (4L, 10L, ts("2024-01-02 00:00:01")), // 1s past → excluded
      (5L, 99L, ts("2024-01-01 01:00:00"))  // other key → never matches
    ).toDF("event_id", "user_id", "t")
    val got = graft.operators.Ranges.rangeJoinCount(rows, rows,
        key = "user_id", time = "t", idCol = "event_id",
        windowMicros = 24L * 3600 * 1000000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2L) // rows 2 and 3; row 4 is past the closed bound
    assert(got(2L) == 2L) // rows 3 and 4
    assert(got(4L) == 0L)
    assert(got(5L) == 0L)
  }

  test("path-addressed table reads (§2.11.4): spark.read over a table dir") {
    wh
    spark.sql("CREATE TABLE covspec.db.p (k INT) USING graft")
    spark.sql("INSERT INTO covspec.db.p VALUES (1), (2), (3)")
    // external consumers can read the open storage layout directly
    val direct = spark.read.parquet(Paths.get(wh, "db", "p", "data").toString)
    assert(direct.count() == 3)
  }

  test("q_window_range: trailing-hour RANGE frame matches a naive per-row witness") {
    val out = graft.operators.Analytics.qWindowRange.fn(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == events.length, "one output row per event")
    val byUser = events.groupBy(_._1)
    // the quantized frame sum, reproduced term-by-term
    def q(v: Double): Long = math.floor(v * 1073741824.0 + 0.5).toLong
    out.foreach { r =>
      val (u, ts) = (r.getLong(0), r.getLong(2))
      val frame = byUser(u).filter(e => e._3 >= ts - 3600000000L && e._3 <= ts)
      assert(r.getLong(3) == frame.length,
        s"user $u @ $ts: n_hour ${r.getLong(3)} vs ${frame.length}")
      val want = BigDecimal(frame.map(e => q(e._4)).sum.toDouble / 1073741824.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - want) < 1e-9,
        s"user $u @ $ts: hour_sum ${r.getDouble(4)} vs $want")
    }
    // value-distance frames, not row-count ones: somewhere a frame must
    // hold >1 event yet FEWER than the user's full history (a ROWS or
    // UNBOUNDED frame could not produce that combination)
    assert(out.exists(r => r.getLong(3) > 1 &&
      r.getLong(3) < byUser(r.getLong(0)).length))
  }
}
