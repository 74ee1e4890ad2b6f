package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors.{dot, norm, toDouble}

/** Embedding-space incremental ingest — the semantic twin of the MinHash
  * band-index ingest (VERDICT r8 #1): a crawl pipeline with an embedding
  * model cannot re-cluster 100 TB of vectors per batch the way the
  * corpus-global SemDeDup query ([[Similarity.semanticDedup]]) does, so
  * the k-means state persists as lake tables through the full
  * optimistic-commit write path and each batch does O(batch) corpus-side
  * work:
  *
  *  - `centroidTable (cluster_id BIGINT, centroid ARRAY<DOUBLE>)`: the
  *    K=32 spherical k-means centroids, trained ONCE (bootstrap: from the
  *    first batch's bounded driver-side sample — the exact
  *    [[Similarity.trainCentroids]] recipe and cost bound) and then only
  *    LOADED: K rows collect to the driver per batch and the assignment
  *    is a map-only argmax against centroid literals, zero shuffle — the
  *    same shape the IVF/SemDeDup family documents. A production pipeline
  *    retrains offline when drift warrants and [[rebuildIndex]]s; no
  *    per-batch training ever touches the corpus.
  *  - `indexTable (cluster_id BIGINT, vec_id BIGINT, v ARRAY<DOUBLE>,
  *    nv DOUBLE)`: one row per ADMITTED vector — the IVF posting lists as
  *    a lake table (the band-index pattern). The per-batch near-dup check
  *    is an inner join of the index SCAN against the BROADCAST batch on
  *    `cluster_id` with the exact-cosine verify fused into the join
  *    filter: the index never shuffles, and only rows of the batch's own
  *    clusters are ever compared (Σ over probed clusters, never corpus²).
  *    At 100 TB, partition the index by `cluster_id` so the scan prunes
  *    to probed clusters, and store a PQ/int8 code instead of the raw
  *    vector (the [[Similarity.qKnnPq]] machinery) with an exact re-check
  *    against corpus rows for the tiny candidate set; at 64 dims the raw
  *    double vector is the simpler exact form.
  *
  * Semantics per batch (τ = [[Tau]], the q_embedding_neardup /
  * q_semantic_dedup threshold; SemDeDup drops ANY vector with a lower-id
  * cluster-mate at cosine ≥ τ):
  *  1. corpus rejection: a batch vector with ANY admitted cluster-mate at
  *     cosine ≥ τ is rejected;
  *  2. intra-batch collapse among the corpus-clean survivors: drop every
  *     vector with a lower-id corpus-clean cluster-mate at cosine ≥ τ —
  *     exact-duplicate classes pre-collapse to one representative first
  *     (identical vectors assign identically and witness at cosine 1, so
  *     rep-level witnessing is equivalent — the [[Similarity.semanticDedup]]
  *     argument verbatim), keeping a duplicate-heavy batch's pair work
  *     proportional to DISTINCT vectors;
  *  3. zero-norm vectors bypass everything (cosine undefined; ANSI would
  *     throw): admitted unindexed with no witness power — exactly
  *     semanticDedup's NULL-cluster keep. Cross-batch dedup of degenerate
  *     zero vectors is [[Ingest.ingestBatch]]'s exact-fingerprint job.
  *
  * Ingesting a corpus as ONE batch into empty tables therefore admits
  * exactly the global semanticDedup keep-set ON THE SAME CENTROIDS
  * (IngestSemanticSpec pins this). Like any online dedup, admission is
  * greedy-by-batch: a batch-k vector whose only witness was itself
  * rejected in batch k-1 stays admitted even though a global run over
  * both batches might have dropped it.
  *
  * Crash contract, the [[Ingest.ingestBatchNearDup]] ordering: centroids
  * commit FIRST at bootstrap (a crash after it leaves trained centroids
  * over an empty corpus — the next batch just uses them), then corpus,
  * then index. A crash between corpus and index appends leaves admitted
  * vectors unindexed — a future near-dup is admitted as a benign
  * duplicate, never lost — and [[rebuildIndex]] is the idempotent
  * recovery. [[retractVectors]] is the quarantine path, index-first like
  * [[Ingest.retractBatch]] and by the same invariant: the index must
  * never claim vectors the corpus doesn't hold.
  *
  * Caller contract: vec_ids unique across corpus + batches; one writer
  * per corpus (the N48 deployment note — racing ingests of the SAME
  * vector can both admit it, the benign-duplicate class again). */
object SemanticIngest {

  /** The q_embedding_neardup / q_semantic_dedup near-dup threshold. */
  val Tau = 0.35

  /** Drift floor (VERDICT r9 #4): a batch vector whose max cosine to ANY
    * centroid is below this has no well-fitting cluster — its intra-
    * cluster dedup decisions are fragile (near-identical vectors can
    * argmax-flip into different clusters and miss each other). A rising
    * `lowAffinity` share across batches is the operational signal to
    * `CALL graft.system.retrain_semantic_index` (IngestSemanticSpec
    * demonstrates the full degrade→retrain→recover cycle). */
  val DriftFloor = 0.2

  /** Per-batch accounting: `batchRows` = `corpusNearDups` +
    * `intraBatchNearDups` + `admitted`; `zeroNorm` counts the admitted
    * vectors that bypassed indexing (subset of `admitted`);
    * `lowAffinity` counts batch vectors under [[DriftFloor]] — the drift
    * metric. `centroidsTrained` is true only on the bootstrap call. */
  final case class SemanticIngestReport(
      batchRows: Long,
      corpusNearDups: Long,
      intraBatchNearDups: Long,
      admitted: Long,
      zeroNorm: Long,
      lowAffinity: Long,
      centroidsTrained: Boolean,
      corpusVersion: Long)

  /** Batch rows prepared for assignment: `(vec_id, v, nv)` with the
    * embedding cast to double once and its norm precomputed once. */
  private def prep(batch: DataFrame): DataFrame =
    batch.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))

  /** Load the persisted centroids (ordered by cluster_id, so index i of
    * the returned seq IS cluster i+1 — array_position's 1-based id), or
    * None when the table is empty (pre-bootstrap). K rows — driver-tiny. */
  private[graft] def loadCentroids(spark: SparkSession,
      centroidTable: String): Option[Seq[Array[Double]]] = {
    val rows = spark.table(centroidTable).orderBy("cluster_id")
      .select("centroid").collect()
    if (rows.isEmpty) None
    else Some(rows.toSeq.map(_.getSeq[Double](0).toArray))
  }

  /** Candidate (corpus vector, batch vector) rows: the index scan inner-
    * joins the BROADCAST assigned batch on cluster_id — the index never
    * shuffles (IngestSemanticSpec pins the plan shape). Columns:
    * id_a/va/na (corpus), id_b/vb/nb (batch). */
  private[graft] def clusterCandidates(index: DataFrame,
      assignedBatch: DataFrame): DataFrame =
    index.join(
        broadcast(assignedBatch.select(col("cluster_id"),
          col("vec_id").as("id_b"), col("v").as("vb"), col("nv").as("nb"))),
        Seq("cluster_id"))
      .select(col("vec_id").as("id_a"), col("v").as("va"), col("nv").as("na"),
        col("id_b"), col("vb"), col("nb"))

  /** Ingest one batch of `(vec_id, embedding)` rows (embedding
    * ARRAY<FLOAT>; extra columns pass through to the corpus table whose
    * schema the batch must match). Returns per-stage accounting. */
  def ingestBatchSemantic(spark: SparkSession, batch: DataFrame,
      corpusTable: String, centroidTable: String, indexTable: String)
      : SemanticIngestReport = {
    require(batch.columns.contains("vec_id") &&
      batch.columns.contains("embedding"),
      s"ingest batch needs vec_id + embedding, got ${batch.columns.mkString(",")}")
    // eager cut, as ingestBatch: the appended rows MUST be the counted rows
    val cut = batch.localCheckpoint()
    val batchRows = cut.count()
    val e = prep(cut)
    val nonzero = e.filter(col("nv") > 0)
    // degenerate first batch (empty, or all zero-norm/NULL embeddings —
    // ADVICE r9): nothing to train on. Skip bootstrap entirely — admit
    // the degenerate rows unindexed with zero-count dedup accounting and
    // leave centroid training to the first batch with signal, mirroring
    // the streaming foreachBatch guard. Training on an empty frame would
    // commit zero centroids and wedge every later batch.
    val preloaded = loadCentroids(spark, centroidTable)
    if (preloaded.isEmpty && nonzero.isEmpty) {
      if (batchRows > 0) cut.writeTo(corpusTable).append()
      val version = Ingest.currentVersion(spark, corpusTable)
      org.apache.spark.sql.graftbridge.CheckpointBridge.free(cut)
      return SemanticIngestReport(
        batchRows = batchRows,
        corpusNearDups = 0,
        intraBatchNearDups = 0,
        admitted = batchRows,
        zeroNorm = batchRows,
        lowAffinity = 0,
        centroidsTrained = false,
        corpusVersion = version)
    }
    // bootstrap: train on this batch's bounded driver sample and commit
    // the centroids BEFORE any data append (see the crash contract)
    val (cents, trained) = preloaded match {
      case Some(cs) => (cs, false)
      case None =>
        val cs = Similarity.trainCentroids(nonzero)
        import spark.implicits._
        cs.zipWithIndex
          .map { case (c, i) => ((i + 1).toLong, c.toSeq) }
          .toDF("cluster_id", "centroid")
          .writeTo(centroidTable).append()
        (cs, true)
    }
    val centSims = Similarity.centSimsFor(cents)
    // map-only assignment; cut once — the corpus probe, the intra-batch
    // collapse, the drift metric and the index append all reuse it
    val assigned = nonzero
      .withColumn("__maxsim", array_max(centSims))
      .withColumn("cluster_id",
        array_position(centSims, col("__maxsim")))
      .localCheckpoint()
    // 1. corpus rejection: index streams, batch broadcasts, exact cosine
    // fused into the join
    val rejected = clusterCandidates(spark.table(indexTable), assigned)
      .filter(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= Tau)
      .select(col("id_b").as("vec_id")).distinct()
    val clean = assigned.join(broadcast(rejected), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    // 2. intra-batch SemDeDup collapse on exact-dup representatives (a
    // vector is its class's rep iff its id IS the class minimum, so the
    // rep set is a semi-join on vec_id alone — no array-equality join)
    val repIds = clean.groupBy("v").agg(min("vec_id").as("vec_id"))
      .select("vec_id")
    val reps = clean.join(repIds, Seq("vec_id"), "left_semi")
    val a = reps.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nv").as("na"))
    val b = reps.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nv").as("nb"))
    val droppedReps = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b") &&
        dot(col("va"), col("vb")) / (col("na") * col("nb")) >= Tau)
      .select(col("id_b").as("vec_id")).distinct()
    // member reconstruction: a non-rep copy always has its rep as a
    // lower-id witness at cosine 1 — only an undropped rep is admitted
    val admittedNonzero = reps
      .join(broadcast(droppedReps), Seq("vec_id"), "left_anti")
      .localCheckpoint() // both appends must write the identical row set
    // null-tolerant complement of the nonzero gate (ADVICE r9): a NULL
    // embedding fails BOTH `nv > 0` and `!(nv > 0)`, so the old predicate
    // silently dropped it from the corpus append while the accounting
    // still claimed it — NULL and zero-norm rows now land in `zeros`
    // uniformly (admitted unindexed, no witness power)
    val zeros = e.filter(coalesce(col("nv"), lit(0.0)) <= 0).select("vec_id")
    // one agg job carries both the nonzero count and the drift metric
    val countsRow = assigned.agg(count(lit(1)),
      count(when(col("__maxsim") < DriftFloor, 1))).head()
    val nonzeroRows = countsRow.getLong(0)
    val lowAffinityRows = countsRow.getLong(1)
    val cleanRows = clean.count()
    val admittedNzRows = admittedNonzero.count()
    val zeroRows = batchRows - nonzeroRows
    // 3. corpus first, index second — see the crash contract
    val admittedIds = admittedNonzero.select("vec_id")
      .unionByName(zeros)
    if (admittedNzRows + zeroRows > 0) {
      cut.join(broadcast(admittedIds), Seq("vec_id"), "left_semi")
        .writeTo(corpusTable).append()
      admittedNonzero.select("cluster_id", "vec_id", "v", "nv")
        .writeTo(indexTable).append()
    }
    val version = Ingest.currentVersion(spark, corpusTable)
    // single-use pipeline: all consumers materialized — free the pinned
    // checkpoints eagerly (VERDICT r9 #1)
    org.apache.spark.sql.graftbridge.CheckpointBridge.free(
      cut, assigned, clean, admittedNonzero)
    SemanticIngestReport(
      batchRows = batchRows,
      corpusNearDups = nonzeroRows - cleanRows,
      intraBatchNearDups = cleanRows - admittedNzRows,
      admitted = admittedNzRows + zeroRows,
      zeroNorm = zeroRows,
      lowAffinity = lowAffinityRows,
      centroidsTrained = trained,
      corpusVersion = version)
  }

  /** Recovery / bootstrap-adoption: rebuild the cluster index from the
    * corpus under the PERSISTED centroids (full overwrite) — one map-only
    * assignment pass over the corpus, the same O(table) commit class as a
    * compaction. Run after a crash between ingest's two appends, or to
    * adopt a pre-existing corpus (train centroids first via a bootstrap
    * ingest or an offline job). Returns the indexed row count. */
  def rebuildIndex(spark: SparkSession, corpusTable: String,
      centroidTable: String, indexTable: String): Long = {
    val cents = loadCentroids(spark, centroidTable).getOrElse(
      throw new IllegalStateException(
        s"no centroids in $centroidTable; bootstrap an ingest first"))
    val centSims = Similarity.centSimsFor(cents)
    val e = prep(spark.table(corpusTable)).filter(col("nv") > 0)
    e.withColumn("cluster_id", array_position(centSims, array_max(centSims)))
      .select("cluster_id", "vec_id", "v", "nv")
      .writeTo(indexTable).overwrite(lit(true))
    spark.table(indexTable).count()
  }

  /** Accounting of [[retrainSemanticIndex]]. */
  final case class RetrainReport(
      corpusVectors: Long, indexedVectors: Long, centroids: Int)

  /** Centroid refresh (VERDICT r9 #4 — the drift response the
    * train-once bootstrap lacks): retrain the spherical k-means centroids
    * on a fresh bounded driver sample of the CURRENT corpus
    * (Similarity.trainCentroids — O(SampleCap·dim) driver memory
    * regardless of corpus size), overwrite the centroid table, then
    * reassign the whole index in one map-only pass ([[rebuildIndex]] —
    * the same O(table) commit class as a compaction). Run it when the
    * ingest reports' `lowAffinity` share rises (SURVEY's continuous-crawl
    * deployment: offline, between batches — one writer, as ingest
    * documents).
    *
    * Commit order: centroids FIRST, then the index overwrite. A crash
    * between the two leaves index rows assigned under the OLD centroids
    * while batches assign under the NEW — cluster-mates can be missed
    * (benign duplicates, the ingest crash class; never data loss) until
    * a rerun or [[rebuildIndex]] converges the state. The reverse order
    * could never converge: an index built on centroids that were never
    * committed is unreconstructible. */
  def retrainSemanticIndex(spark: SparkSession, corpusTable: String,
      centroidTable: String, indexTable: String): RetrainReport = {
    val e = prep(spark.table(corpusTable)).filter(col("nv") > 0)
    val corpusVectors = e.count()
    require(corpusVectors > 0,
      s"$corpusTable holds no nonzero-norm vectors to retrain on")
    val cs = Similarity.trainCentroids(e)
    import spark.implicits._
    cs.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toSeq) }
      .toDF("cluster_id", "centroid")
      .writeTo(centroidTable).overwrite(lit(true))
    val indexed = rebuildIndex(spark, corpusTable, centroidTable, indexTable)
    RetrainReport(corpusVectors, indexed, cs.size)
  }

  /** Accounting of [[retractVectors]] — the semantic twin of
    * [[Ingest.RetractReport]]. */
  final case class SemanticRetractReport(
      corpusVectorsRemoved: Long,
      indexRowsRemoved: Long,
      corpusVersion: Long)

  /** Quarantine a previously-admitted vector set: two DELETE commits,
    * index FIRST — the [[Ingest.retractBatch]] invariant (the index must
    * never claim vectors the corpus doesn't hold; a crash between the
    * commits leaves unindexed corpus vectors, the benign re-admit class,
    * and a rerun or [[rebuildIndex]] converges). Zero-match tables skip
    * their DELETE (idempotent reruns are true no-ops). Pre-counts are
    * non-atomic under a concurrent writer, as retractBatch documents. */
  def retractVectors(spark: SparkSession, vecIds: Seq[Long],
      corpusTable: String, indexTable: String): SemanticRetractReport = {
    require(vecIds.nonEmpty, "retractVectors needs at least one vec_id")
    val inList = vecIds.mkString(", ")
    val corpusMatched = spark.table(corpusTable)
      .filter(col("vec_id").isin(vecIds: _*)).count()
    val indexMatched = spark.table(indexTable)
      .filter(col("vec_id").isin(vecIds: _*)).count()
    if (indexMatched > 0)
      spark.sql(s"DELETE FROM $indexTable WHERE vec_id IN ($inList)")
    if (corpusMatched > 0)
      spark.sql(s"DELETE FROM $corpusTable WHERE vec_id IN ($inList)")
    val version = Ingest.currentVersion(spark, corpusTable)
    SemanticRetractReport(
      corpusVectorsRemoved = corpusMatched,
      indexRowsRemoved = indexMatched,
      corpusVersion = version)
  }

  /** Frame-sized [[retractVectors]] — the semantic twin of
    * `Ingest.retractBatch(keys: DataFrame)`: a `vec_id` manifest of any
    * size commits as ONE equality-delete file per table (O(|keys|), no
    * data-file scan), index FIRST, zero-match tables skipping their
    * commit so reruns are true no-ops. */
  def retractVectors(spark: SparkSession, keys: DataFrame,
      corpusTable: String, indexTable: String): SemanticRetractReport = {
    require(keys.columns.contains("vec_id"),
      s"retraction keys need a vec_id column, got ${keys.columns.mkString(",")}")
    val k = keys.select("vec_id").distinct().localCheckpoint()
    val indexMatched = Ingest.equalityRetract(spark, indexTable, k, "vec_id")
    val corpusMatched = Ingest.equalityRetract(spark, corpusTable, k, "vec_id")
    val version = Ingest.currentVersion(spark, corpusTable)
    org.apache.spark.sql.graftbridge.CheckpointBridge.free(k)
    SemanticRetractReport(
      corpusVectorsRemoved = corpusMatched,
      indexRowsRemoved = indexMatched,
      corpusVersion = version)
  }
}
