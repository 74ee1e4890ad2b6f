package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ingest, Pipeline}

/** Contract of the incremental NEAR-dup ingest (VERDICT r7 #2): per-stage
  * accounting, cross-batch near-dup rejection through the lake-resident
  * band index, intra-batch collapse, idempotent re-ingest, equivalence
  * with the global MinHash collapse when the corpus arrives as one batch,
  * the O(batch) plan shape, and the rebuild-after-crash recovery path. */
class IngestNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "ndingestcat"

  private var n = 0
  /** Fresh corpus + band tables per test (shared warehouse catalog). */
  private def setup(): (String, String) = {
    if (spark.conf.getOption(s"spark.sql.catalog.$Cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$Cat",
        classOf[graft.lake.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$Cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft-wh-ndingest").toString)
    }
    n += 1
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.ing")
    val (c, b) = (s"$Cat.ing.corpus$n", s"$Cat.ing.bands$n")
    spark.sql(s"CREATE TABLE $c (doc_id BIGINT, text STRING) USING graft")
    spark.sql(
      s"CREATE TABLE $b (band_idx INT, band_hash BIGINT, doc_id BIGINT) USING graft")
    (c, b)
  }

  // 40+ tokens so single-word perturbations keep J ≈ 0.85 ≫ 1/2 and the
  // 8-band LSH candidates them deterministically (verified below)
  private def words(tag: String, k: Int): String =
    (1 to k).map(i => s"$tag$i").mkString(" ")
  private val baseA = words("alpha", 40)
  private val nearA = (words("alpha", 39) + " zzz") // last word differs
  private val baseB = words("beta", 40)
  private val nearB = ("zzz " + words("beta", 40).split(" ").drop(1)
    .mkString(" ")) // first word differs
  private val baseC = words("gamma", 40)

  private def ids(t: String): Seq[Long] =
    spark.table(t).select("doc_id").as[Long].collect().sorted.toSeq

  test("two-batch ingest: accounting, cross-batch near-dup, idempotence") {
    val (c, b) = setup()
    // batch1: baseA admitted; 2 = exact dup of 1; 3 = near-dup of 1
    // (intra-batch collapse); 4 = quality reject; baseB admitted
    val batch1 = Seq(
      1L -> baseA, 2L -> ("  " + baseA.toUpperCase + " "),
      3L -> nearA, 4L -> "too short", 5L -> baseB).toDF("doc_id", "text")
    val r1 = Ingest.ingestBatchNearDup(spark, batch1, c, b)
    assert(r1.copy(corpusVersion = 0) ==
      Ingest.NearDupIngestReport(5, 1, 1, 0, 1, 2, 0), s"got $r1")
    assert(ids(c) == Seq(1L, 5L))
    // 8 band rows per admitted doc
    assert(spark.table(b).count() == 16)

    // batch2: 6 = near-dup of admitted 1 (rejected via the index);
    // 7 = exact dup of admitted 5 (J = 1.0 through the same path);
    // 8 = brand new
    val batch2 = Seq(6L -> nearA, 7L -> baseB, 8L -> baseC)
      .toDF("doc_id", "text")
    val r2 = Ingest.ingestBatchNearDup(spark, batch2, c, b)
    assert(r2.copy(corpusVersion = 0) ==
      Ingest.NearDupIngestReport(3, 0, 0, 2, 0, 1, 0), s"got $r2")
    assert(ids(c) == Seq(1L, 5L, 8L))
    assert(r2.corpusVersion > r1.corpusVersion)

    // idempotence: re-ingesting batch2 under new ids admits nothing
    val r3 = Ingest.ingestBatchNearDup(spark,
      Seq(16L -> nearA, 17L -> baseB, 18L -> baseC).toDF("doc_id", "text"),
      c, b)
    assert(r3.copy(corpusVersion = 0) ==
      Ingest.NearDupIngestReport(3, 0, 0, 3, 0, 0, 0), s"got $r3")
    assert(ids(c) == Seq(1L, 5L, 8L))
  }

  test("one-batch ingest admits exactly the global MinHash collapse") {
    val (c, b) = setup()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val r = Ingest.ingestBatchNearDup(spark, docs, c, b)
    // expected: the global pipeline run in memory on the same gated batch
    // — quality gate (the identical TextProfile expression), exact
    // collapse, LSH+verify pairs, component minima
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val prof = ColumnBridge.column(
      graft.functions.TextProfile(ColumnBridge.expression(col("text"))))
    val gated = docs.withColumn("__p", prof)
      .filter(col("__p.n_tokens").between(10, 100000) &&
        graft.operators.TextOps.perCharRatio(col("__p.n_punct")) < 0.1)
      .drop("__p")
    val members = graft.operators.PipelineBridge.dupClasses(gated)
    val reps = graft.operators.PipelineBridge.repDocsOf(gated, members)
    val sigs = Dedup.minhashSignatures(reps)
    val pairs = Dedup.exactJaccard(reps, Dedup.lshCandidates(sigs))
      .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val comps = graft.operators.PipelineBridge.cc(spark,
      reps.select(col("doc_id").as("id")), edges)
    val expected = comps.filter(col("id") === col("comp"))
      .select(col("id").as("doc_id")).as[Long].collect().sorted.toSeq
    assert(ids(c) == expected,
      s"admitted ${ids(c).size} docs, expected ${expected.size}")
    assert(r.admitted == expected.size)
    assert(expected.nonEmpty)
  }

  test("band-candidate join broadcasts the batch over the streaming index") {
    val (c, b) = setup()
    Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA, 2L -> baseB).toDF("doc_id", "text"), c, b)
    val batchBands = Dedup.minhashBands(Dedup.minhashSignatures(
      Seq(3L -> baseC).toDF("doc_id", "text")))
    val cand = Ingest.corpusBandCandidates(spark.table(b), batchBands)
    val shape = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(shape.contains("BroadcastHashJoin"),
      s"index probe must broadcast the batch side:\n$shape")
    assert(!shape.contains("SortMergeJoin"),
      s"index side must never shuffle into a sort-merge join:\n$shape")
  }

  test("rebuildBandIndex recovers detection after a crash between appends") {
    val (c, b) = setup()
    Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA).toDF("doc_id", "text"), c, b)
    // simulate the crash window: a doc lands in the corpus but its bands
    // never commit — a near-dup of it is NOT detected
    Seq(2L -> baseB).toDF("doc_id", "text").writeTo(c).append()
    val miss = Ingest.ingestBatchNearDup(spark,
      Seq(3L -> nearB).toDF("doc_id", "text"), c, b)
    assert(miss.admitted == 1, "unindexed corpus doc must be missed pre-rebuild")
    // recovery: rebuild the band index from the corpus (now 1, 2, 3)
    val rows = Ingest.rebuildBandIndex(spark, c, b)
    assert(rows == spark.table(c).count() * 8)
    val caught = Ingest.ingestBatchNearDup(spark,
      Seq(4L -> nearB).toDF("doc_id", "text"), c, b)
    assert(caught.copy(corpusVersion = 0) ==
      Ingest.NearDupIngestReport(1, 0, 0, 1, 0, 0, 0), s"got $caught")
  }

  test("retractBatch removes docs + bands and lifts the rejection") {
    val (c, b) = setup()
    val r1 = Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA, 2L -> baseB).toDF("doc_id", "text"), c, b)
    assert(r1.admitted == 2)
    // poisoned-batch discovery: doc 1 must stop rejecting its near-dups
    val blocked = Ingest.ingestBatchNearDup(spark,
      Seq(3L -> nearA).toDF("doc_id", "text"), c, b)
    assert(blocked.corpusNearDups == 1 && blocked.admitted == 0)

    val rr = Ingest.retractBatch(spark, Seq(1L), c, b)
    assert(rr.corpusDocsRemoved == 1, s"got $rr")
    assert(rr.bandRowsRemoved == 8, s"got $rr")
    assert(rr.corpusVersion > r1.corpusVersion)
    assert(ids(c) == Seq(2L))
    assert(spark.table(b).filter($"doc_id" === 1L).count() == 0)

    // the rejection is lifted: the same near-dup is now admitted
    val freed = Ingest.ingestBatchNearDup(spark,
      Seq(4L -> nearA).toDF("doc_id", "text"), c, b)
    assert(freed.admitted == 1, s"got $freed")
    assert(ids(c) == Seq(2L, 4L))

    // idempotence: re-retracting the same ids is a reported no-op
    val rr2 = Ingest.retractBatch(spark, Seq(1L), c, b)
    assert(rr2.corpusDocsRemoved == 0 && rr2.bandRowsRemoved == 0, s"got $rr2")
    assert(ids(c) == Seq(2L, 4L))
  }

  test("retraction crash window converges: bands-first order + rerun") {
    val (c, b) = setup()
    Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA, 2L -> baseB).toDF("doc_id", "text"), c, b)
    // simulate the crash BETWEEN retractBatch's two commits: bands gone,
    // corpus row still present — by the bands-first invariant this is the
    // benign side (an unbanded corpus doc admits future near-dups as
    // duplicates; stale bands would silently reject clean docs)
    spark.sql(s"DELETE FROM $b WHERE doc_id IN (1)")
    val dupe = Ingest.ingestBatchNearDup(spark,
      Seq(3L -> nearA).toDF("doc_id", "text"), c, b)
    assert(dupe.admitted == 1, "unbanded corpus doc must not reject")
    // recovery = rerun the retraction (idempotent): corpus row finally goes
    val rr = Ingest.retractBatch(spark, Seq(1L), c, b)
    assert(rr.corpusDocsRemoved == 1 && rr.bandRowsRemoved == 0, s"got $rr")
    assert(ids(c) == Seq(2L, 3L))
  }

  test("frame-sized retraction: law parity with the Seq overload") {
    // same scenario as the Seq-overload test, driven through the
    // DataFrame overload (VERDICT r8 #3): accounting, rejection lift,
    // true-no-op idempotent rerun, O(keys) equality commits
    val (c, b) = setup()
    val r1 = Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA, 2L -> baseB).toDF("doc_id", "text"), c, b)
    assert(r1.admitted == 2)
    val blocked = Ingest.ingestBatchNearDup(spark,
      Seq(3L -> nearA).toDF("doc_id", "text"), c, b)
    assert(blocked.corpusNearDups == 1 && blocked.admitted == 0)

    val keys = Seq(1L).toDF("doc_id")
    val rr = Ingest.retractBatch(spark, keys, c, b)
    assert(rr.corpusDocsRemoved == 1 && rr.bandRowsRemoved == 8, s"got $rr")
    assert(ids(c) == Seq(2L))
    assert(spark.table(b).filter($"doc_id" === 1L).count() == 0)
    // the frame path ALWAYS commits equality deletes — O(keys), no scan
    val last = spark.table(s"$c.snapshots")
      .orderBy($"snapshot_id".desc).limit(1)
      .select("operation", "summary").collect()(0)
    assert(last.getString(0) == "delete", s"got $last")
    assert(last.getMap[String, String](1).get("delete-kind")
      .contains("equality"), s"got $last")

    // rejection lifted
    val freed = Ingest.ingestBatchNearDup(spark,
      Seq(4L -> nearA).toDF("doc_id", "text"), c, b)
    assert(freed.admitted == 1, s"got $freed")

    // idempotent rerun is a TRUE no-op: zero counts AND no new snapshot
    val versBefore = (
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0),
      spark.table(s"$b.history").agg(max("snapshot_id")).head().getLong(0))
    val rr2 = Ingest.retractBatch(spark, keys, c, b)
    assert(rr2.corpusDocsRemoved == 0 && rr2.bandRowsRemoved == 0, s"got $rr2")
    val versAfter = (
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0),
      spark.table(s"$b.history").agg(max("snapshot_id")).head().getLong(0))
    assert(versBefore == versAfter,
      s"no-op frame retraction must not commit: $versBefore -> $versAfter")

    // parity: a fresh pair of tables retracted via the Seq overload ends
    // in the same corpus/band state and reports the same counts
    val (c2, b2) = setup()
    Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA, 2L -> baseB).toDF("doc_id", "text"), c2, b2)
    Ingest.ingestBatchNearDup(spark, Seq(3L -> nearA).toDF("doc_id", "text"),
      c2, b2)
    val rrSeq = Ingest.retractBatch(spark, Seq(1L), c2, b2)
    assert(rrSeq.corpusDocsRemoved == rr.corpusDocsRemoved &&
      rrSeq.bandRowsRemoved == rr.bandRowsRemoved, s"$rrSeq vs $rr")
    assert(ids(c2) == Seq(2L))
    assert(spark.table(b2).count() == spark.table(b).count() -
      8) // b has doc 4's bands from the rejection-lift step above
  }

  test("retraction on merge-on-read tables commits O(keys) equality deletes") {
    val (c, b) = setup()
    spark.sql(s"ALTER TABLE $c SET TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')")
    spark.sql(s"ALTER TABLE $b SET TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')")
    Ingest.ingestBatchNearDup(spark,
      Seq(1L -> baseA, 2L -> baseB).toDF("doc_id", "text"), c, b)
    val rr = Ingest.retractBatch(spark, Seq(1L), c, b)
    assert(rr.corpusDocsRemoved == 1 && rr.bandRowsRemoved == 8)
    assert(ids(c) == Seq(2L))
    // the retraction commit is a pure-equality delete: keys only, no scan
    val last = spark.table(s"$c.snapshots")
      .orderBy($"snapshot_id".desc).limit(1)
      .select("operation", "summary").collect()(0)
    assert(last.getString(0) == "delete", s"got $last")
    val summary = last.getMap[String, String](1)
    assert(summary.get("delete-kind").contains("equality"), s"got $summary")
  }
}
