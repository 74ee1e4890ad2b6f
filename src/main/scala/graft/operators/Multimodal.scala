package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** Multimodal column handling (SURVEY.md §2.9 N5): media as opaque `binary`
  * columns with typed struct metadata, plus the decode / feature-extract /
  * frame-sample plumbing of a training-data pipeline.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`fakeDecode`) — but everything
  * Spark-side is real and tested: the schema (binary payload + metadata
  * struct), the partition-preserving `mapPartitions` batch shape (the Scala
  * equivalent of `mapInPandas`: one iterator per partition, so a real
  * decoder would amortize model/codec init per partition, not per row), and
  * the columnar pre/post processing around it.
  *
  * Scale notes: payloads never shuffle — decode/feature steps are
  * narrow transformations; only the small extracted features would ever be
  * aggregated. Metadata filters (codec/width) prune before decode so
  * undecodable rows never reach the expensive stage.
  */
object Multimodal {

  /** Synthesize a media-shaped table from `documents`: payload bytes +
    * typed metadata struct. Stands in for real image/audio ingestion.
    * Metadata derives from doc_id via PORTABLE integer arithmetic
    * (Knuth multiplicative hash mod dimensions) so the metadata queries
    * are oracle-checkable in DuckDB. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        // mod BEFORE multiply: (a*K) mod m == ((a mod m)*K) mod m, and the
        // reduced product stays < 3.4e12 — the direct product overflows
        // Long for doc_id ≳ 3.5e9 (sf1's strided ids) under ANSI mode
        (pmod(pmod(col("doc_id"), lit(1280)) * 2654435761L, lit(1280)) + 64)
          .cast("int").as("width"),
        (pmod(pmod(col("doc_id"), lit(720)) * 40503L, lit(720)) + 64)
          .cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 0, "jpeg")
          .when(pmod(col("doc_id"), lit(3)) === 1, "png")
          .otherwise("wav").as("codec"),
        col("source").as("origin")).as("meta"))

  /** STUB — deterministic fake decode. A real deployment would replace this
    * with an image/audio codec call; signature and batch shape are the
    * contract. Returns a fixed-length "feature" derived from the bytes.
    * Accumulates in DOUBLE (standard practice for mean/sum features) and
    * narrows to float at the end — which also makes the value exactly
    * reproducible by any engine that sums the same bytes in the same
    * order, so the pipeline query is oracle-checkable. */
  private def fakeDecode(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xff) / 255.0
      i += 1
    }
    acc.map(_.toFloat)
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("codec", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** Decode + feature-extract via mapPartitions: per-partition batch
    * iteration (codec init once per partition — the mapInPandas shape). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media
      .select(col("media_id"), col("meta.codec").as("codec"), col("payload"))
      .rdd.mapPartitions { rows =>
        // per-partition init would go here (codec handles, model weights)
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("codec"),
            bytes.length, fakeDecode(bytes).toSeq)
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Frame sampling: every Nth byte-window of the payload as a "frame" —
    * the video-frame-sampling plumbing with a byte-slice stand-in. Pure
    * expression (no UDF): slice windows computed with sequence/transform. */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(
        transform(
          sequence(lit(1), greatest(
            floor((length(col("payload")) - frameLen) / stride).cast("int") + 1,
            lit(1))),
          i => substring(col("payload"), (i - lit(1)) * stride + 1, lit(frameLen))))
        .as(Seq("frame_idx", "frame_bytes")))

  /** End-to-end multimodal pipeline: metadata filter → decode stub →
    * feature stats. Oracle-checked (round-3): the decode stub sums
    * byte/255 in DOUBLE in byte order, so DuckDB reproduces f0 exactly
    * with a stride-8 character walk (the corpus is ASCII: 1 char = 1
    * byte), the same double→float→double narrowing, and the same 4dp
    * round. ScalaTest still checks the round-trip and batch shape. */
  val qMultimodalPipeline: Q = Q(
    "q_multimodal_pipeline",
    """SELECT doc_id AS media_id,
              CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
                   WHEN doc_id % 3 = 1 THEN 'png'
                   ELSE 'wav' END AS codec,
              CAST(strlen(text) AS INTEGER) AS n_bytes,
              round(CAST(CAST(coalesce(list_sum(
                [ascii(substr(text, CAST(i AS INTEGER), 1)) / 255.0
                 FOR i IN range(1, strlen(text) + 1, 8)]), 0) AS REAL)
                AS DOUBLE), 4) AS f0
       FROM documents
       WHERE ((doc_id % 1280) * 2654435761) % 1280 + 64 >= 64
       ORDER BY media_id""") { (s, d) =>
    val media = mediaTable(s, d).filter(col("meta.width") >= 64)
    decodeFeatures(media)
      .select(col("media_id"), col("codec"), col("n_bytes"),
        round(element_at(col("feature"), 1).cast("double"), 4).as("f0"))
      .orderBy("media_id")
  }

  /** Metadata-only query — prunes to the struct columns; the payload
    * bytes only contribute a length. Oracle-checked: the metadata
    * synthesis is portable arithmetic over doc_id. */
  val qMediaMetadata: Q = Q(
    "q_media_metadata",
    """SELECT CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
                   WHEN doc_id % 3 = 1 THEN 'png'
                   ELSE 'wav' END AS codec,
              count(*) AS n,
              CAST((20000 * sum(((doc_id % 1280) * 2654435761) % 1280 + 64)
                    + count(*)) // (2 * count(*)) AS DOUBLE) / 10000 AS avg_width,
              CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
       FROM documents GROUP BY 1 ORDER BY codec""") { (s, d) =>
    mediaTable(s, d)
      .groupBy(col("meta.codec").as("codec"))
      .agg(count(lit(1)).as("n"),
        // integer mean, half-up in integer arithmetic (see ExactSum.intRatio)
        (expr("(20000 * sum(CAST(meta.width AS BIGINT)) + count(1)) div " +
          "(2 * count(1))").cast("double") / lit(1e4)).as("avg_width"),
        sum(length(col("payload"))).as("total_bytes"))
      .orderBy("codec")
  }

  /** Frame-sampling query: frames per media item. The frame count and
    * byte totals are pure integer arithmetic over the payload length
    * (full 32-byte frames except a single short frame for sub-frame
    * payloads), so the byte-slice plumbing IS oracle-checkable: strlen
    * in DuckDB counts bytes, matching Spark's length(binary). */
  val qFrameSample: Q = Q(
    "q_frame_sample",
    """SELECT doc_id AS media_id,
              CAST(greatest((strlen(text) - 32) // 16 + 1, 1) AS BIGINT) AS n_frames,
              CAST(CASE WHEN strlen(text) >= 32
                        THEN greatest((strlen(text) - 32) // 16 + 1, 1) * 32
                        ELSE strlen(text) END AS BIGINT) AS sampled_bytes
       FROM documents ORDER BY media_id""") { (s, d) =>
    sampleFrames(mediaTable(s, d), frameLen = 32, stride = 16)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("sampled_bytes"))
      .orderBy("media_id")
  }

  /** DuckDB CTEs computing each payload's DHash64 exactly (the q_simhash
    * promotion pattern, VERDICT r8 #2): 65 position-bucket byte sums per
    * document (bucket b = the ceil-boundary dual of the kernel's
    * bucket-of-position ⌊i·65/n⌋ — identical partitions), then 63 plain
    * BIGINT bit terms plus the MIN_VALUE sentinel for bit 63. Pure
    * integer math → exact. ASCII corpus: 1 char = 1 byte (the standing
    * qMultimodalPipeline assumption), so ascii(substr(...)) IS the
    * payload byte. */
  private def dhashSql: String = {
    val bits = (0 until 63).map(b =>
      s"(CASE WHEN s[${b + 2}] > s[${b + 1}] THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ") +
      " + (CASE WHEN s[65] > s[64] THEN -9223372036854775808 ELSE 0 END)"
    s"""sums AS (
         SELECT doc_id,
                [coalesce(list_sum([ascii(substr(text, CAST(j AS INTEGER), 1))
                                    FOR j IN range((b*strlen(text)+64)//65 + 1,
                                                   ((b+1)*strlen(text)+64)//65 + 1)]), 0)
                 FOR b IN range(0, 65)] AS s
         FROM documents WHERE text IS NOT NULL),
       sig AS (SELECT doc_id, $bits AS phash FROM sums)"""
  }

  /** [[dhashSql]] over an arbitrary `(media_id, text)` CTE — the reusable
    * form the media-ingest oracle composes (emits `msums`/`msig`, keyed
    * by media_id, signatures only for non-NULL texts). */
  private[operators] def dhashSqlOver(src: String): String = {
    val bits = (0 until 63).map(b =>
      s"(CASE WHEN s[${b + 2}] > s[${b + 1}] THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ") +
      " + (CASE WHEN s[65] > s[64] THEN -9223372036854775808 ELSE 0 END)"
    s"""msums AS (
         SELECT media_id,
                [coalesce(list_sum([ascii(substr(text, CAST(j AS INTEGER), 1))
                                    FOR j IN range((b*strlen(text)+64)//65 + 1,
                                                   ((b+1)*strlen(text)+64)//65 + 1)]), 0)
                 FOR b IN range(0, 65)] AS s
         FROM $src WHERE text IS NOT NULL),
       msig AS (SELECT media_id, $bits AS phash FROM msums)"""
  }

  private def dhashCol(payload: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.DHash64(ColumnBridge.expression(payload)))
  }

  /** Perceptual hash per media item: one codegen-free kernel pass over the
    * binary payload — no explode, no shuffle, embarrassingly parallel
    * (graft.functions.DHash64). ORACLE-CHECKED: dHash is pure integer
    * math, so the DuckDB twin reproduces every signature exactly. */
  val qImagePhash: Q = Q(
    "q_image_phash",
    s"""WITH ${dhashSql}
       SELECT d.doc_id AS media_id, sig.phash AS phash
       FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
       ORDER BY media_id""") { (s, d) =>
    mediaTable(s, d)
      .select(col("media_id"), dhashCol(col("payload")).as("phash"))
      .orderBy("media_id")
  }

  /** Perceptual NEAR-dup media pairs: items within Hamming distance ≤ 3 of
    * each other's DHash64 — the multimodal twin of q_simhash_pairs, and
    * the dedup operator the media tier was missing (VERDICT r8 #2).
    * Pigeonhole banding makes it an equi-join: 4 × 16-bit bands, any two
    * signatures within Hamming 3 agree exactly on ≥ 1 band; candidates
    * verify with bit_count(xor). One shuffle on the band key, never
    * all-pairs.
    *
    * Scale design (100 TB of media): banding runs on DISTINCT signatures —
    * a duplication-heavy corpus pre-collapses by SIGNATURE class (for this
    * operator the signature IS the compared value, so signature-level
    * pre-collapse is exact, not an approximation needing a verify pass);
    * member pairs reconstruct by class join, intra-class pairs at Hamming
    * 0. Like every pair LISTING here, the output is quadratic in per-class
    * duplication — production consumes the class labels, not the pairs.
    *
    * ORACLE-CHECKED: the DuckDB twin computes every signature via
    * [[dhashSql]], bands NAIVELY (no pre-collapse) and verifies with
    * bit_count — the hash compare doubles as a standing proof that the
    * signature-class collapse + expansion is row-identical to the naive
    * all-member banding. */
  val qImageNearDup: Q = Q(
    "q_image_neardup",
    s"""WITH ${dhashSql},
       bands AS (
         SELECT doc_id, phash,
                b.b AS band_idx, (phash >> (b.b * 16)) & 65535 AS band_val
         FROM sig, (VALUES (0), (1), (2), (3)) b(b)),
       cand AS (
         SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                x.phash AS sa, y.phash AS sb
         FROM bands x JOIN bands y
           ON x.band_idx = y.band_idx AND x.band_val = y.band_val
          AND x.doc_id < y.doc_id),
       pairs AS (
         SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
         FROM cand WHERE bit_count(xor(sa, sb)) <= 3)
       SELECT id_a, id_b, hamming FROM pairs
       UNION ALL
       SELECT -1, -1, CAST(count(*) AS INTEGER) FROM pairs
       ORDER BY id_a, id_b""") { (s, d) =>
    val sigs = mediaTable(s, d)
      .select(col("media_id"), dhashCol(col("payload")).as("ph"))
      .filter(col("ph").isNotNull)
    // signature-class pre-collapse: identical signatures always share
    // every band, so banding runs on one representative per distinct
    // signature and members reconstruct exactly
    val members = sigs.join(
      sigs.groupBy("ph").agg(min("media_id").as("__rep")), "ph")
    val reps = members.filter(col("media_id") === col("__rep"))
      .select(col("media_id"), col("ph"))
    val banded = reps.select(col("media_id"), col("ph"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_idx", "band_val")))
    val repPairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("rep_a"), col("b.media_id").as("rep_b"),
        col("a.ph").as("ph_a"), col("b.ph").as("ph_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= 3)
      .select(col("rep_a"), col("rep_b"), col("hamming"))
    val ma = members.select(col("__rep").as("rep_a"), col("media_id").as("__ma"))
    val mb = members.select(col("__rep").as("rep_b"), col("media_id").as("__mb"))
    val cross = repPairs.join(ma, "rep_a").join(mb, "rep_b")
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"), col("hamming"))
    val intra = members.as("a")
      .join(members.as("b"),
        col("a.ph") === col("b.ph") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        lit(0).as("hamming"))
    val expanded = cross.unionAll(intra)
    // summary row keeps the result non-empty on near-dup-free corpora
    expanded
      .unionAll(expanded.agg(count(lit(1)).as("cnt")).select(
        lit(-1L).as("id_a"), lit(-1L).as("id_b"),
        col("cnt").cast("int").as("hamming")))
      .orderBy("id_a", "id_b")
  }

  val all: Seq[Q] = Seq(qMultimodalPipeline, qMediaMetadata, qFrameSample,
    qImagePhash, qImageNearDup)
}
