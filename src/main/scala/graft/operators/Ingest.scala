package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The one-call corpus-ingest step a continuously-fed training corpus
  * needs: quality gate → intra-batch exact dedup → cross-batch dedup
  * against the lake-resident fingerprint index → append the admitted
  * documents to the corpus table and their fingerprints to the index.
  * Composes the operators the oracle gate pins individually
  * (q_text_quality's filter, q_dedup_fingerprint's key,
  * q_lake_ingest_dedup's index join) into the API a pipeline user
  * actually calls per crawl batch.
  *
  * Scale design (100 TB corpus, O(batch) work per call):
  *  - The quality gate and fingerprints are one TextProfile/md5 pass over
  *    the BATCH only; the corpus is never touched.
  *  - Intra-batch dedup is a batch-sized window; the cross-batch check
  *    broadcasts the batch's fingerprints into a semi-join that STREAMS
  *    over the index scan — the index (one 16 B fp + id per corpus doc)
  *    never shuffles, exactly the q_lake_ingest_dedup shape.
  *  - Both appends are O(batch) optimistic commits through the full lake
  *    write path.
  *
  * Crash contract: the corpus append commits BEFORE the index append. A
  * crash between the two leaves admitted documents unindexed — a future
  * batch could re-admit an identical text (benign duplicate, caught by
  * any later offline dedup) — but never loses data or indexes a document
  * that was not admitted. [[rebuildIndex]] restores the index from the
  * corpus table and is the idempotent recovery step (IngestSpec pins
  * that rebuild-after-partial-ingest converges to the same state).
  *
  * Concurrency contract: every append is an optimistic lake commit, so
  * concurrent ingests NEVER lose rows or corrupt the version chain
  * (IngestSpec races disjoint batches to pin this). The check-then-append
  * window is not transactional across callers, though: two ingests
  * racing the SAME text can both admit it — the same benign-duplicate
  * class as the crash case, resolved by offline dedup or by serializing
  * ingest per corpus (one writer per crawl stream is the normal
  * deployment).
  */
object Ingest {

  /** Per-batch accounting: `batchRows` = `qualityRejected` +
    * `intraBatchDups` + `alreadyIndexed` + `admitted`. `corpusVersion` is
    * the corpus table's snapshot id after this ingest — pin it in a
    * training run (`VERSION AS OF`) and the exact corpus this batch
    * produced is reproducible forever, independent of later ingests. */
  final case class IngestReport(
      batchRows: Long,
      qualityRejected: Long,
      intraBatchDups: Long,
      alreadyIndexed: Long,
      admitted: Long,
      corpusVersion: Long)

  /** The q_text_quality/q_corpus_prep keep rule: 10 ≤ tokens ≤ 100000 and
    * punctuation ratio < 0.1, one TextProfile kernel pass. NULL text
    * fails the gate (its profile is NULL → predicate is not true). */
  private def qualityFilter(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val prof = ColumnBridge.column(
      graft.functions.TextProfile(ColumnBridge.expression(col("text"))))
    batch.withColumn("__p", prof)
      .filter(col("__p.n_tokens").between(10, 100000) &&
        TextOps.perCharRatio(col("__p.n_punct")) < 0.1)
      .drop("__p")
  }

  /** Ingest one batch into `corpusTable`, deduplicating against
    * `indexTable` (schema `(fp STRING, doc_id BIGINT)`). The batch must
    * carry `doc_id` and `text` and match the corpus table's schema.
    * Returns the per-stage accounting. */
  def ingestBatch(spark: SparkSession, batch: DataFrame,
      corpusTable: String, indexTable: String): IngestReport = {
    require(batch.columns.contains("doc_id") && batch.columns.contains("text"),
      s"ingest batch needs doc_id + text, got ${batch.columns.mkString(",")}")
    val batchRows = batch.count()
    // cut the gated batch eagerly: the dedup window, the index join and
    // the appends all consume it, and the appended rows MUST be the rows
    // that were counted (a lazy recompute racing a source change could
    // admit rows the report never saw)
    val gated = qualityFilter(batch)
      .withColumn("__fp", TextOps.normalizedFp(col("text")))
      .localCheckpoint()
    val gatedRows = gated.count()
    // intra-batch exact dedup: first doc_id wins per fingerprint class
    val first = gated
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__fp").orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__rn")
    // cross-batch: fingerprints some PAST batch already admitted. The
    // index side streams; only the batch's fp set broadcasts.
    val dupFps = spark.table(indexTable)
      .join(broadcast(first.select(col("__fp").as("fp"))), Seq("fp"), "left_semi")
      .select("fp").distinct()
    val admitted = first
      .join(broadcast(dupFps.withColumnRenamed("fp", "__dupfp")),
        col("__fp") === col("__dupfp"), "left_anti")
      .localCheckpoint() // both appends must write the identical row set
    val firstRows = first.count()
    val admittedRows = admitted.count()
    // corpus first, index second — see the crash contract above
    admitted.drop("__fp").writeTo(corpusTable).append()
    admitted.select(col("__fp").as("fp"), col("doc_id"))
      .writeTo(indexTable).append()
    // the snapshot the training run pins: current corpus head (this
    // ingest's commit when it admitted anything; under a concurrent
    // ingest the head may already include a later commit — still a valid,
    // superset pin of this batch)
    val version = spark.table(s"$corpusTable.history")
      .agg(max("snapshot_id")).head().getLong(0)
    IngestReport(
      batchRows = batchRows,
      qualityRejected = batchRows - gatedRows,
      intraBatchDups = gatedRows - firstRows,
      alreadyIndexed = firstRows - admittedRows,
      admitted = admittedRows,
      corpusVersion = version)
  }

  /** Recovery / bootstrap: rebuild the fingerprint index from the corpus
    * table (full overwrite). One corpus pass — the md5 projection is
    * map-only and the write is the same O(table) commit a compaction
    * makes; run it after a crash between ingestBatch's two appends, or to
    * adopt a pre-existing corpus. Returns the indexed row count. */
  def rebuildIndex(spark: SparkSession, corpusTable: String,
      indexTable: String): Long = {
    val fps = spark.table(corpusTable)
      .select(TextOps.normalizedFp(col("text")).as("fp"), col("doc_id"))
    fps.writeTo(indexTable).overwrite(lit(true))
    spark.table(indexTable).count()
  }
}
