package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perceptual-hash incremental ingest for MEDIA payloads — the third leg
  * of the ingest triptych (exact-fingerprint [[Ingest.ingestBatch]],
  * MinHash-text [[Ingest.ingestBatchNearDup]], embedding
  * [[SemanticIngest.ingestBatchSemantic]]): a crawl of images/audio blobs
  * dedups each batch against a lake-resident DHash64 band index in
  * O(batch) corpus-side work.
  *
  *  - `indexTable (band_idx INT, band_val BIGINT, media_id BIGINT,
  *    phash BIGINT)`: 4 rows per admitted item (16-bit pigeonhole bands
  *    of the 64-bit perceptual hash). The index row CARRIES the full
  *    signature, so the corpus near-dup check is one inner join of the
  *    streaming index scan against the BROADCAST batch bands with the
  *    `bit_count(xor) ≤ 3` verify fused into the join — the corpus table
  *    itself is never read during ingest.
  *  - Pigeonhole makes banding LOSSLESS at the Hamming ≤ 3 threshold
  *    (two signatures within 3 flips agree exactly on ≥ 1 of 4 bands),
  *    and dHash is pure integer math — so unlike the text and embedding
  *    twins, this ingest's END-TO-END admission decisions are
  *    oracle-checkable (q_lake_ingest_media hash-compares the per-stage
  *    accounting against a DuckDB twin that recomputes every signature
  *    and replays the greedy admission with a recursive-CTE component
  *    collapse).
  *
  * Per batch: a validity gate (non-NULL, non-empty payload — the decode
  * stub's "decodable" stand-in) → intra-batch EXACT dedup (first id wins
  * per identical-payload class; identical payloads always share the
  * signature) → corpus rejection through the band index → intra-batch
  * near-dup collapse among the corpus-clean representatives (Hamming ≤ 3
  * edges → connected components → component-min admission, the
  * [[Ingest.ingestBatchNearDup]] convention) → corpus append, then index
  * append. Same crash contract as the siblings: corpus-before-index; a
  * crash between the commits re-admits a future near-dup as a benign
  * duplicate, never loses data; [[rebuildIndex]] recovers. Same greedy
  * online contract: rejection is against ADMITTED items only. Caller
  * contract: media_ids unique across corpus + batches; one writer. */
object MediaIngest {

  /** Hamming radius of the near-dup ball (4 × 16-bit bands ⇒ lossless). */
  val MaxHamming = 3

  /** Clean-rep count up to which the intra-batch component collapse folds
    * on the DRIVER (VERDICT r9 #6): a batch is driver-sized by
    * construction (16 B per rep), and the iterative Spark CC's fixed cost
    * (one shuffle round per component diameter, twice per ingest
    * roundtrip) dominated the media-ingest wall. Above it — an
    * intentionally huge bootstrap batch — the distributed path runs. */
  private val DriverCcMaxReps = 20000L

  /** Exact Hamming-≤[[MaxHamming]] component MINIMA of a driver-sized
    * `(media_id, phash)` rep set — the identical edge set the distributed
    * path derives (pigeonhole banding is lossless at radius 3), folded
    * with a union-find instead of O(diameter) Spark rounds. Same-phash
    * reps union in O(n) through a first-of-phash map; banded buckets then
    * compare only DISTINCT phashes pairwise, so a duplicate-heavy batch
    * never goes quadratic in the copy count (the dupClasses argument). */
  private[graft] def driverComponentMinima(
      reps0: Array[(Long, Long)]): Array[Long] = {
    val reps = reps0.sortBy(_._1) // index order = media_id order
    val n = reps.length
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = {
      var r = i
      while (parent(r) != r) r = parent(r)
      var c = i
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    // min root wins ⇒ every root IS its component's min media_id
    def union(i: Int, j: Int): Unit = {
      val a = find(i); val b = find(j)
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val firstOfPhash = new java.util.HashMap[java.lang.Long, Integer](n * 2)
    val distinct = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      val prev = firstOfPhash.putIfAbsent(reps(i)._2, i)
      if (prev != null) union(prev, i) else distinct += i
      i += 1
    }
    var b = 0
    while (b < 4) {
      val buckets = new java.util.HashMap[java.lang.Long,
        scala.collection.mutable.ArrayBuffer[Int]]()
      distinct.foreach { d =>
        val key = (reps(d)._2 >>> (16 * b)) & 0xFFFFL
        buckets.computeIfAbsent(key,
          _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += d
      }
      buckets.values().forEach { lst =>
        var x = 0
        while (x < lst.length) {
          var y = x + 1
          while (y < lst.length) {
            if (java.lang.Long.bitCount(
                reps(lst(x))._2 ^ reps(lst(y))._2) <= MaxHamming)
              union(lst(x), lst(y))
            y += 1
          }
          x += 1
        }
      }
      b += 1
    }
    (0 until n).collect { case j if find(j) == j => reps(j)._1 }.toArray
  }

  /** Per-batch accounting: `batchRows` = `gateRejected` +
    * `intraBatchExactDups` + `corpusNearDups` + `intraBatchNearDups` +
    * `admitted`. */
  final case class MediaIngestReport(
      batchRows: Long,
      gateRejected: Long,
      intraBatchExactDups: Long,
      corpusNearDups: Long,
      intraBatchNearDups: Long,
      admitted: Long,
      corpusVersion: Long)

  private def dhash(payload: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.DHash64(ColumnBridge.expression(payload)))
  }

  /** 4 × 16-bit band rows of a (media_id, phash) frame. */
  private[operators] def phashBands(sigs: DataFrame): DataFrame =
    sigs.select(col("media_id"), col("phash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_val")))
      .select(col("band_idx").cast("int"), col("band_val"),
        col("media_id"), col("phash"))

  /** Candidate (corpus item, batch item) rows with the Hamming verify
    * fused in: the index scan streams, the batch bands broadcast
    * (IngestMediaSpec pins the plan shape). */
  private[operators] def corpusMediaCandidates(index: DataFrame,
      batchBands: DataFrame): DataFrame =
    index.join(
        broadcast(batchBands
          .select(col("band_idx"), col("band_val"),
            col("media_id").as("id_b"), col("phash").as("ph_b"))),
        Seq("band_idx", "band_val"))
      .filter(bit_count(col("phash").bitwiseXOR(col("ph_b"))) <= MaxHamming)
      .select(col("media_id").as("id_a"), col("id_b")).distinct()

  /** Ingest one batch of `(media_id, payload)` rows (payload BINARY;
    * extra columns pass through to the corpus table whose schema the
    * batch must match). */
  def ingestBatchMedia(spark: SparkSession, batch: DataFrame,
      corpusTable: String, indexTable: String): MediaIngestReport = {
    require(batch.columns.contains("media_id") &&
      batch.columns.contains("payload"),
      s"ingest batch needs media_id + payload, got ${batch.columns.mkString(",")}")
    val cut = batch.localCheckpoint()
    val batchRows = cut.count()
    // validity gate: the "decodable payload" stand-in
    val gated = cut.filter(col("payload").isNotNull &&
      length(col("payload")) > 0)
    // ONE aggregate job carries gatedRows AND firstRows (r11): `first`
    // keeps one row per payload-md5 class, so firstRows is the gated
    // frame's distinct-fingerprint count — no second dedup-window pass.
    val cRow = gated.agg(count(lit(1)),
      count_distinct(md5(col("payload")))).head()
    val (gatedRows, firstRows) = (cRow.getLong(0), cRow.getLong(1))
    // intra-batch exact dedup: first media_id wins per payload class
    val first = gated
      .withColumn("__fp", md5(col("payload")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__fp").orderBy("media_id")))
      .filter(col("__rn") === 1).drop("__rn", "__fp")
    val sigs = first.select(col("media_id"), dhash(col("payload")).as("phash"))
      .localCheckpoint()
    val bands = phashBands(sigs).localCheckpoint()
    // corpus rejection: index streams, batch broadcasts, verify fused
    val rejected = corpusMediaCandidates(spark.table(indexTable), bands)
      .select(col("id_b").as("media_id")).distinct()
    val clean = first.join(broadcast(rejected), Seq("media_id"), "left_anti")
      .localCheckpoint()
    // intra-batch near-dup collapse: Hamming<=3 edges on clean reps ->
    // component-min admission (banding is lossless at radius 3, so the
    // banded equi-join IS the exact edge set). Batch-sized rep sets fold
    // on the driver (VERDICT r9 #6); the distributed CC is the
    // above-threshold fallback with identical output.
    val cleanRows = clean.count()
    val admitted = if (cleanRows <= DriverCcMaxReps) {
      val reps = sigs
        .join(broadcast(clean.select("media_id")), Seq("media_id"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val keep = driverComponentMinima(reps)
      import spark.implicits._
      clean.join(broadcast(keep.toSeq.toDF("media_id")),
        Seq("media_id"), "left_semi")
        .localCheckpoint() // both appends must write the identical row set
    } else {
      val cleanBands = bands.join(broadcast(clean.select("media_id")),
        Seq("media_id"), "left_semi")
      val intraPairs = cleanBands.as("a")
        .join(cleanBands.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
        .filter(bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
          <= MaxHamming)
        .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
        .distinct()
      val edges = intraPairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(intraPairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val comps = Pipeline.connectedComponents(spark,
        clean.select(col("media_id").as("id")), edges)
      val adm = clean.join(
          broadcast(comps.filter(col("id") === col("comp"))
            .select(col("id").as("media_id"))),
          Seq("media_id"), "left_semi")
        .localCheckpoint() // both appends must write the identical row set
      org.apache.spark.sql.graftbridge.CheckpointBridge.free(comps)
      adm
    }
    val admittedRows = admitted.count()
    // corpus first, index second — the triptych's crash contract
    admitted.writeTo(corpusTable).append()
    bands.join(broadcast(admitted.select("media_id")),
        Seq("media_id"), "left_semi")
      .select("band_idx", "band_val", "media_id", "phash")
      .writeTo(indexTable).append()
    val version = Ingest.currentVersion(spark, corpusTable)
    // single-use pipeline: all consumers materialized — free the pinned
    // checkpoints eagerly (VERDICT r9 #1)
    org.apache.spark.sql.graftbridge.CheckpointBridge.free(
      cut, sigs, bands, clean, admitted)
    MediaIngestReport(
      batchRows = batchRows,
      gateRejected = batchRows - gatedRows,
      intraBatchExactDups = gatedRows - firstRows,
      corpusNearDups = firstRows - cleanRows,
      intraBatchNearDups = cleanRows - admittedRows,
      admitted = admittedRows,
      corpusVersion = version)
  }

  /** Recovery / bootstrap-adoption: rebuild the band index from the
    * corpus (full overwrite) — one DHash64 pass, the same O(table)
    * commit class as a compaction. Returns the indexed band-row count. */
  def rebuildIndex(spark: SparkSession, corpusTable: String,
      indexTable: String): Long = {
    val sigs = spark.table(corpusTable)
      .filter(col("payload").isNotNull && length(col("payload")) > 0)
      .select(col("media_id"), dhash(col("payload")).as("phash"))
    phashBands(sigs)
      .select("band_idx", "band_val", "media_id", "phash")
      .writeTo(indexTable).overwrite(lit(true))
    spark.table(indexTable).count()
  }
}
