package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, SemanticIngest}

/** Contract of the incremental EMBEDDING-space ingest (VERDICT r8 #1):
  * per-stage accounting, cross-batch near-dup rejection through the
  * lake-resident cluster index, intra-batch SemDeDup collapse, idempotent
  * re-ingest, equivalence with the global semanticDedup keep-set when the
  * corpus arrives as one batch, the O(batch) plan shape, retraction, and
  * the rebuild-after-crash recovery path. */
class IngestSemanticSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "semingestcat"

  private var n = 0
  /** Fresh corpus + centroid + index tables per test. */
  private def setup(): (String, String, String) = {
    if (spark.conf.getOption(s"spark.sql.catalog.$Cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$Cat",
        classOf[graft.lake.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$Cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft-wh-semingest").toString)
    }
    n += 1
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.ing")
    val (c, k, x) = (s"$Cat.ing.corpus$n", s"$Cat.ing.centroids$n",
      s"$Cat.ing.index$n")
    spark.sql(s"CREATE TABLE $c (vec_id BIGINT, embedding ARRAY<FLOAT>) USING graft")
    spark.sql(s"CREATE TABLE $k (cluster_id BIGINT, centroid ARRAY<DOUBLE>) USING graft")
    spark.sql(
      s"CREATE TABLE $x (cluster_id BIGINT, vec_id BIGINT, v ARRAY<DOUBLE>, nv DOUBLE) USING graft")
    (c, k, x)
  }

  // orthogonal unit directions in dim 8 (cosine 0 < τ across families)
  // and a within-family perturbation at cosine ≈ 0.994 ≥ τ = 0.35
  private def unit(i: Int): Seq[Float] =
    (0 until 8).map(j => if (j == i) 1.0f else 0.0f)
  private def near(i: Int, j: Int): Seq[Float] =
    (0 until 8).map(k => if (k == i) 0.9f else if (k == j) 0.1f else 0.0f)
  private val zero: Seq[Float] = Seq.fill(8)(0.0f)

  private def ids(t: String): Seq[Long] =
    spark.table(t).select("vec_id").as[Long].collect().sorted.toSeq

  test("two-batch ingest: bootstrap, accounting, cross-batch rejection, idempotence") {
    val (c, k, x) = setup()
    // seed: three orthogonal family bases — centroids train to exactly
    // these directions (spherical means of singleton clusters)
    val seed = Seq(1L -> unit(0), 2L -> unit(2), 3L -> unit(4))
      .toDF("vec_id", "embedding")
    val r1 = SemanticIngest.ingestBatchSemantic(spark, seed, c, k, x)
    assert(r1.copy(corpusVersion = 0) == SemanticIngest.SemanticIngestReport(
      3, 0, 0, 3, 0, 0, centroidsTrained = true, 0), s"got $r1")
    assert(ids(c) == Seq(1L, 2L, 3L))
    assert(spark.table(x).count() == 3)
    assert(spark.table(k).count() >= 3) // one centroid per seed direction

    // batch2: 11 = exact dup of admitted 1; 12 = near-dup of admitted 1
    // (both rejected via the cluster index); 13 = new orthogonal family;
    // 14 = zero vector (admitted unindexed); 15/16 = intra-batch near-dup
    // pair of another new family (16 collapses onto 15)
    val batch2 = Seq(11L -> unit(0), 12L -> near(0, 1), 13L -> unit(6),
      14L -> zero, 15L -> unit(1), 16L -> near(1, 3))
      .toDF("vec_id", "embedding")
    val r2 = SemanticIngest.ingestBatchSemantic(spark, batch2, c, k, x)
    assert(r2.copy(corpusVersion = 0) == SemanticIngest.SemanticIngestReport(
      6, 2, 1, 3, 1, 3, centroidsTrained = false, 0), s"got $r2")
    assert(ids(c) == Seq(1L, 2L, 3L, 13L, 14L, 15L))
    // index rows exclude the zero vector
    assert(spark.table(x).count() == 5)
    assert(spark.table(x).filter($"vec_id" === 14L).count() == 0)
    assert(r2.corpusVersion > r1.corpusVersion)

    // idempotence: re-ingesting batch2's admitted vectors under new ids
    // rejects all of them through the corpus index — except the zero
    // vector, which semantic dedup can never witness (documented; the
    // exact-fingerprint ingest is the dedup path for degenerate payloads)
    val r3 = SemanticIngest.ingestBatchSemantic(spark,
      Seq(23L -> unit(6), 24L -> zero, 25L -> unit(1))
        .toDF("vec_id", "embedding"), c, k, x)
    assert(r3.copy(corpusVersion = 0) == SemanticIngest.SemanticIngestReport(
      3, 2, 0, 1, 1, 2, centroidsTrained = false, 0), s"got $r3")
    assert(ids(c) == Seq(1L, 2L, 3L, 13L, 14L, 15L, 24L))
  }

  test("one-batch ingest admits exactly the global semanticDedup keep-set") {
    val (c, k, x) = setup()
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val r = SemanticIngest.ingestBatchSemantic(spark, vecs, c, k, x)
    // global SemDeDup over the same frame: bootstrap trained on the same
    // nonzero rows with the same stride sample, so centroids coincide
    val e = vecs
      .select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nv", graft.functions.Vectors.norm(col("v")))
    val expected = Similarity.semanticDedup(e)
      .filter(col("keep")).select("vec_id").as[Long].collect().sorted.toSeq
    assert(ids(c) == expected,
      s"admitted ${ids(c).size} vectors, expected ${expected.size}")
    assert(r.admitted == expected.size)
    assert(r.batchRows ==
      r.corpusNearDups + r.intraBatchNearDups + r.admitted)
    assert(expected.nonEmpty)
  }

  test("cluster-candidate join broadcasts the batch over the streaming index") {
    val (c, k, x) = setup()
    SemanticIngest.ingestBatchSemantic(spark,
      Seq(1L -> unit(0), 2L -> unit(2)).toDF("vec_id", "embedding"), c, k, x)
    val assigned = Seq((1L, 3L, Seq(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0), 1.0))
      .toDF("cluster_id", "vec_id", "v", "nv")
    val cand = SemanticIngest.clusterCandidates(spark.table(x), assigned)
    val shape = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(shape.contains("BroadcastHashJoin"),
      s"index probe must broadcast the batch side:\n$shape")
    assert(!shape.contains("SortMergeJoin"),
      s"index side must never shuffle into a sort-merge join:\n$shape")
  }

  test("rebuildIndex recovers detection after a crash between appends") {
    val (c, k, x) = setup()
    SemanticIngest.ingestBatchSemantic(spark,
      Seq(1L -> unit(0), 2L -> unit(2)).toDF("vec_id", "embedding"), c, k, x)
    // crash window: a vector lands in the corpus but its index row never
    // commits — a near-dup of it is NOT detected
    Seq(3L -> unit(4)).toDF("vec_id", "embedding").writeTo(c).append()
    val miss = SemanticIngest.ingestBatchSemantic(spark,
      Seq(4L -> near(4, 1)).toDF("vec_id", "embedding"), c, k, x)
    assert(miss.admitted == 1, "unindexed corpus vector must be missed pre-rebuild")
    val rows = SemanticIngest.rebuildIndex(spark, c, k, x)
    assert(rows == spark.table(c).count())
    val caught = SemanticIngest.ingestBatchSemantic(spark,
      Seq(5L -> near(4, 1)).toDF("vec_id", "embedding"), c, k, x)
    assert(caught.copy(corpusVersion = 0) ==
      SemanticIngest.SemanticIngestReport(
        1, 1, 0, 0, 0, 1, centroidsTrained = false, 0), s"got $caught")
  }

  test("retractVectors removes corpus + index rows and lifts the rejection") {
    val (c, k, x) = setup()
    val r1 = SemanticIngest.ingestBatchSemantic(spark,
      Seq(1L -> unit(0), 2L -> unit(2)).toDF("vec_id", "embedding"), c, k, x)
    assert(r1.admitted == 2)
    val blocked = SemanticIngest.ingestBatchSemantic(spark,
      Seq(3L -> near(0, 1)).toDF("vec_id", "embedding"), c, k, x)
    assert(blocked.corpusNearDups == 1 && blocked.admitted == 0)

    val rr = SemanticIngest.retractVectors(spark, Seq(1L), c, x)
    assert(rr.corpusVectorsRemoved == 1 && rr.indexRowsRemoved == 1, s"got $rr")
    assert(ids(c) == Seq(2L))
    val freed = SemanticIngest.ingestBatchSemantic(spark,
      Seq(4L -> near(0, 1)).toDF("vec_id", "embedding"), c, k, x)
    assert(freed.admitted == 1, s"got $freed")

    // idempotent rerun is a TRUE no-op: no new snapshot on either table
    val versBefore = (
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0),
      spark.table(s"$x.history").agg(max("snapshot_id")).head().getLong(0))
    val rr2 = SemanticIngest.retractVectors(spark, Seq(1L), c, x)
    assert(rr2.corpusVectorsRemoved == 0 && rr2.indexRowsRemoved == 0)
    val versAfter = (
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0),
      spark.table(s"$x.history").agg(max("snapshot_id")).head().getLong(0))
    assert(versBefore == versAfter,
      s"no-op retraction must not commit: $versBefore -> $versAfter")
  }

  test("degenerate first batch: no training, admitted unindexed, later batch bootstraps") {
    val (c, k, x) = setup()
    // ADVICE r9: an all-zero-norm first batch must not train (empty
    // k-means sample) or wedge the bootstrap — admit unindexed and wait
    val r0 = SemanticIngest.ingestBatchSemantic(spark,
      Seq(1L -> zero).toDF("vec_id", "embedding"), c, k, x)
    assert(!r0.centroidsTrained && r0.admitted == 1 && r0.zeroNorm == 1,
      s"got $r0")
    assert(spark.table(k).count() == 0, "no centroids from a degenerate batch")
    assert(ids(c) == Seq(1L))
    // an EMPTY batch is a no-op, not a crash
    val rEmpty = SemanticIngest.ingestBatchSemantic(spark,
      Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding"), c, k, x)
    assert(rEmpty.batchRows == 0 && rEmpty.admitted == 0, s"got $rEmpty")
    // the first batch with signal still bootstraps normally
    val r1 = SemanticIngest.ingestBatchSemantic(spark,
      Seq(2L -> unit(0)).toDF("vec_id", "embedding"), c, k, x)
    assert(r1.centroidsTrained && r1.admitted == 1, s"got $r1")
  }

  test("NULL embeddings land in the corpus and the accounting matches state") {
    val (c, k, x) = setup()
    SemanticIngest.ingestBatchSemantic(spark,
      Seq(1L -> unit(0)).toDF("vec_id", "embedding"), c, k, x)
    // ADVICE r9: a NULL embedding failed BOTH null-rejecting filters —
    // claimed admitted/zeroNorm but never appended. It must be state, too.
    val withNull = Seq((2L, Some(unit(1))), (3L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val r = SemanticIngest.ingestBatchSemantic(spark, withNull, c, k, x)
    assert(r.zeroNorm == 1 && r.admitted == 2, s"got $r")
    assert(ids(c) == Seq(1L, 2L, 3L),
      "the NULL-embedding row must actually land in the corpus")
    assert(spark.table(x).filter($"vec_id" === 3L).count() == 0,
      "NULL rows stay unindexed")
  }

  test("drift cycle: lowAffinity flags stale centroids, retrain restores dedup recall") {
    // Two arms over IDENTICAL data: bootstrap on corpus A (structure in
    // dims 0..31), then a drifted stream (structure in dims 32..543,
    // 8 wide clusters; members at cos ≈ 0.2 < τ to each other, so the
    // only τ-near-dups are the planted base→dup pairs at cos ≈ 0.9999).
    // Under STALE centroids the drifted vectors' cluster assignment is
    // decided by ~0.01-magnitude A-subspace noise, so a 0.02 perturbation
    // argmax-flips pairs apart and intra-cluster dedup misses them; after
    // CALL retrain_semantic_index the clusters live in the drifted
    // subspace and assignment is robust. VERDICT r9 #4's done criterion.
    val rnd = new scala.util.Random(11)
    val D = 544
    def aVec(k: Int): Seq[Float] = {
      val v = Array.fill(D)(0.0)
      v(4 * k) = 1.0
      (0 until 32).foreach(i => v(i) += 0.05 / math.sqrt(32) * rnd.nextGaussian())
      v.map(_.toFloat).toSeq
    }
    def bVec(k: Int): Array[Double] = {
      val v = Array.fill(D)(0.0)
      v(32 + k) = 1.0
      (32 until D).foreach(i => v(i) += 2.0 / math.sqrt(512) * rnd.nextGaussian())
      (0 until 32).foreach(i => v(i) += 0.01 / math.sqrt(32) * rnd.nextGaussian())
      v
    }
    def perturb(v: Array[Double]): Array[Double] = {
      val w = v.clone()
      (0 until 32).foreach(i => w(i) += 0.02 / math.sqrt(32) * rnd.nextGaussian())
      w
    }
    val corpusA = (0 until 200).map(i => (i + 1).toLong -> aVec(i % 8))
    val d1 = (0 until 80).map(i => (1000 + i).toLong -> bVec(i % 8))
    val bases = (0 until 80).map(i => (2000 + 2 * i).toLong -> bVec(i % 8))
    val dups = bases.map { case (id, v) => (id + 1) -> perturb(v) }
    def f(xs: Seq[(Long, Array[Double])]): Seq[(Long, Seq[Float])] =
      xs.sortBy(_._1).map { case (id, v) => id -> v.map(_.toFloat).toSeq }
    val dupIds = dups.map(_._1)

    def runArm(retrain: Boolean) = {
      val (c, k, x) = setup()
      SemanticIngest.ingestBatchSemantic(spark,
        corpusA.toDF("vec_id", "embedding"), c, k, x)
      val rD1 = SemanticIngest.ingestBatchSemantic(spark,
        f(d1).toDF("vec_id", "embedding"), c, k, x)
      if (retrain) {
        val row = spark.sql(s"CALL $Cat.system.retrain_semantic_index(" +
          s"corpus => '${c.stripPrefix(s"$Cat.")}', " +
          s"centroids => '${k.stripPrefix(s"$Cat.")}', " +
          s"index => '${x.stripPrefix(s"$Cat.")}')").collect()(0)
        assert(row.getLong(1) == spark.table(x).count(),
          "retrain must reindex the whole nonzero corpus")
      }
      val rD2 = SemanticIngest.ingestBatchSemantic(spark,
        f(bases ++ dups).toDF("vec_id", "embedding"), c, k, x)
      val admittedDups = spark.table(c)
        .filter($"vec_id".isin(dupIds: _*)).count()
      (1.0 - admittedDups.toDouble / dups.size, rD1, rD2)
    }
    val (recallStale, staleD1, _) = runArm(retrain = false)
    val (recallRetrained, _, retrD2) = runArm(retrain = true)
    // the drift METRIC: stale centroids see the drifted batch as
    // low-affinity; retrained centroids fit it
    assert(staleD1.lowAffinity >= (0.9 * staleD1.batchRows).toLong,
      s"drifted batch under stale centroids must read low-affinity: $staleD1")
    assert(retrD2.lowAffinity <= (0.2 * retrD2.batchRows).toLong,
      s"retrained centroids must fit the drifted stream: $retrD2")
    // the RECALL law: stale measurably below the 0.95 bar, retrain restores
    assert(recallStale < 0.95,
      f"stale dedup recall $recallStale%.3f should be degraded on drift")
    assert(recallRetrained >= 0.95,
      f"retrained dedup recall $recallRetrained%.3f must clear 0.95")
    assert(recallRetrained > recallStale)
  }

  test("frame-sized retractVectors: law parity with the Seq overload") {
    val (c, k, x) = setup()
    SemanticIngest.ingestBatchSemantic(spark,
      Seq(1L -> unit(0), 2L -> unit(2)).toDF("vec_id", "embedding"), c, k, x)
    val rr = SemanticIngest.retractVectors(spark,
      Seq(1L).toDF("vec_id"), c, x)
    assert(rr.corpusVectorsRemoved == 1 && rr.indexRowsRemoved == 1, s"got $rr")
    assert(ids(c) == Seq(2L))
    // equality commit kind, O(keys)
    val last = spark.table(s"$c.snapshots")
      .orderBy($"snapshot_id".desc).limit(1)
      .select("operation", "summary").collect()(0)
    assert(last.getString(0) == "delete" &&
      last.getMap[String, String](1).get("delete-kind").contains("equality"))
    // rejection lifted + idempotent no-op rerun commits nothing
    val freed = SemanticIngest.ingestBatchSemantic(spark,
      Seq(3L -> near(0, 1)).toDF("vec_id", "embedding"), c, k, x)
    assert(freed.admitted == 1, s"got $freed")
    val versBefore =
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0)
    val rr2 = SemanticIngest.retractVectors(spark,
      Seq(1L).toDF("vec_id"), c, x)
    assert(rr2.corpusVectorsRemoved == 0 && rr2.indexRowsRemoved == 0)
    assert(spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0)
      == versBefore, "no-op frame retraction must not commit")
  }

  test("streaming twin rejects embedding near-dups across micro-batches") {
    val (c, k, x) = setup()
    implicit val sqlCtx = spark.sqlContext
    val ck = java.nio.file.Files.createTempDirectory("graft-ck-semingest").toString
    val input = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    // an exact duplicate ALWAYS co-clusters (identical assignment), so the
    // intra-batch collapse is deterministic even on this 1-centroid
    // bootstrap; a mere near-dup pair trains into 2 singleton clusters and
    // is faithfully kept apart — the SemDeDup cross-cluster contract the
    // two-batch spec exercises with seed-trained centroids instead
    input.addData((1L, unit(0)), (2L, unit(0)))
    graft.streaming.Streams.semanticIngestIntoLakeTables(
      spark, stream, c, k, x, ck)
    assert(ids(c) == Seq(1L), "intra-batch collapse in the first micro-batch")
    input.addData((3L, near(0, 2)), (4L, unit(3)))
    graft.streaming.Streams.semanticIngestIntoLakeTables(
      spark, stream, c, k, x, ck)
    assert(ids(c) == Seq(1L, 4L),
      "a near-dup of an earlier micro-batch's admission must be rejected")
  }
}
