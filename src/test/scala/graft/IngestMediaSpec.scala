package graft

import org.apache.spark.sql.functions._
import graft.operators.MediaIngest

/** Contract of the perceptual MEDIA ingest (the ingest triptych's third
  * leg): per-stage accounting, cross-batch near-dup rejection through the
  * lake-resident DHash64 band index, intra-batch collapse, idempotent
  * re-ingest, the O(batch) plan shape, and rebuild-after-crash. */
class IngestMediaSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "mediaingestcat"

  private var n = 0
  private def setup(): (String, String) = {
    if (spark.conf.getOption(s"spark.sql.catalog.$Cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$Cat",
        classOf[graft.lake.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$Cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft-wh-mediaingest").toString)
    }
    n += 1
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.ing")
    val (c, x) = (s"$Cat.ing.corpus$n", s"$Cat.ing.index$n")
    spark.sql(s"CREATE TABLE $c (media_id BIGINT, payload BINARY) USING graft")
    spark.sql(
      s"CREATE TABLE $x (band_idx INT, band_val BIGINT, media_id BIGINT, phash BIGINT) USING graft")
    (c, x)
  }

  // 650-byte pseudo-random payloads (varied bucket sums — monotone or
  // constant content degenerates to all-zero signatures that collide);
  // pairwise base Hamming 35-45, the single-byte edit lands at Hamming 2
  // (geometry asserted below so a fixture regression fails loudly)
  private def bytesOf(s: String) = s.getBytes("UTF-8")
  private def mk(mult: Int, off: Int): String =
    (0 until 650).map(i =>
      ('a' + ((i * mult + (i * i) / 7 + off) % 26)).toChar).mkString
  private val baseA = mk(3, 0)
  private val nearA = baseA.substring(0, 300) + "z" + baseA.substring(301)
  private val baseB = mk(5, 7)
  private val baseC = mk(11, 13)

  private def ham(a: String, b: String): Int = {
    def d(s: String): Long = {
      val by = bytesOf(s); val n = by.length.toLong
      val sums = new Array[Long](65)
      by.indices.foreach(i => sums(((i.toLong * 65) / n).toInt) += (by(i) & 0xff))
      (0 until 64).foldLeft(0L)((sig, k) =>
        if (sums(k + 1) > sums(k)) sig | (1L << k) else sig)
    }
    java.lang.Long.bitCount(d(a) ^ d(b))
  }

  private def ids(t: String): Seq[Long] =
    spark.table(t).select("media_id").as[Long].collect().sorted.toSeq

  test("fixture geometry: nearA within the ball, cross-payloads outside") {
    assert(ham(baseA, nearA) <= 3, s"ham=${ham(baseA, nearA)}")
    assert(ham(baseA, baseB) > 3 && ham(baseA, baseC) > 3 &&
      ham(baseB, baseC) > 3)
  }

  test("two-batch ingest: accounting, cross-batch rejection, idempotence") {
    val (c, x) = setup()
    // batch1: baseA admitted; 2 = exact dup of 1; 3 = near-dup of 1
    // (intra collapse); 4 = NULL payload (gate); 5 = empty (gate); baseB
    val batch1 = Seq(
      (1L, Option(baseA)), (2L, Option(baseA)), (3L, Option(nearA)),
      (4L, None: Option[String]), (5L, Option("")), (6L, Option(baseB)))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val r1 = MediaIngest.ingestBatchMedia(spark, batch1, c, x)
    assert(r1.copy(corpusVersion = 0) == MediaIngest.MediaIngestReport(
      6, 2, 1, 0, 1, 2, 0), s"got $r1")
    assert(ids(c) == Seq(1L, 6L))
    assert(spark.table(x).count() == 8) // 4 bands per admitted item

    // batch2: 7 near-dups admitted 1 via the index; 8 = exact dup of 6
    // (Hamming 0 through the same path); 9 = new
    val batch2 = Seq(7L -> nearA, 8L -> baseB, 9L -> baseC)
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val r2 = MediaIngest.ingestBatchMedia(spark, batch2, c, x)
    assert(r2.copy(corpusVersion = 0) == MediaIngest.MediaIngestReport(
      3, 0, 0, 2, 0, 1, 0), s"got $r2")
    assert(ids(c) == Seq(1L, 6L, 9L))
    assert(r2.corpusVersion > r1.corpusVersion)

    // idempotence: re-ingesting the admitted payloads under new ids
    // rejects everything
    val r3 = MediaIngest.ingestBatchMedia(spark,
      Seq(11L -> baseA, 16L -> baseB, 19L -> baseC).toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload")),
      c, x)
    assert(r3.copy(corpusVersion = 0) == MediaIngest.MediaIngestReport(
      3, 0, 0, 3, 0, 0, 0), s"got $r3")
    assert(ids(c) == Seq(1L, 6L, 9L))
  }

  test("band-candidate join broadcasts the batch over the streaming index") {
    val (c, x) = setup()
    MediaIngest.ingestBatchMedia(spark,
      Seq(1L -> baseA).toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload")),
      c, x)
    val batchBands = graft.operators.MediaIngestBridge.bands(spark,
      Seq(2L -> baseB).toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload")))
    val cand = graft.operators.MediaIngestBridge.candidates(
      spark.table(x), batchBands)
    val shape = cand.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(shape.contains("BroadcastHashJoin"),
      s"index probe must broadcast the batch side:\n$shape")
    assert(!shape.contains("SortMergeJoin"),
      s"index side must never shuffle into a sort-merge join:\n$shape")
  }

  test("streaming twin rejects perceptual near-dups across micro-batches") {
    val (c, x) = setup()
    implicit val sqlCtx = spark.sqlContext
    val ck = java.nio.file.Files.createTempDirectory("graft-ck-mediaingest").toString
    val input = org.apache.spark.sql.execution.streaming
      .runtime.MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    input.addData((1L, baseA), (2L, nearA))
    graft.streaming.Streams.mediaIngestIntoLakeTables(spark, stream, c, x, ck)
    assert(ids(c) == Seq(1L), "intra-batch collapse in the first micro-batch")
    input.addData((3L, nearA), (4L, baseB))
    graft.streaming.Streams.mediaIngestIntoLakeTables(spark, stream, c, x, ck)
    assert(ids(c) == Seq(1L, 4L),
      "a near-dup of an earlier micro-batch's admission must be rejected")
  }

  test("rebuildIndex recovers detection after a crash between appends") {
    val (c, x) = setup()
    MediaIngest.ingestBatchMedia(spark,
      Seq(1L -> baseA).toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload")),
      c, x)
    // crash window: corpus row without index rows → near-dup missed
    Seq(2L -> baseB).toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
      .writeTo(c).append()
    val miss = MediaIngest.ingestBatchMedia(spark,
      Seq(3L -> baseB).toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload")),
      c, x)
    assert(miss.admitted == 1, "unindexed corpus item must be missed pre-rebuild")
    val rows = MediaIngest.rebuildIndex(spark, c, x)
    assert(rows == spark.table(c).count() * 4)
    val caught = MediaIngest.ingestBatchMedia(spark,
      Seq(4L -> baseB).toDF("media_id", "text")
        .select(col("media_id"), col("text").cast("binary").as("payload")),
      c, x)
    assert(caught.copy(corpusVersion = 0) == MediaIngest.MediaIngestReport(
      1, 0, 0, 1, 0, 0, 0), s"got $caught")
  }

  test("driverComponentMinima equals a brute-force Hamming-component witness") {
    // the driver-side fold (VERDICT r9 #6) must produce the EXACT
    // component minima the distributed path derives: same Hamming-<=3
    // edge set (pigeonhole banding is lossless at radius 3), min id per
    // component. Witness: O(n^2) edge scan + BFS over a clustered fixture
    // (near-dup balls around 20 base hashes + random singletons).
    val rnd = new scala.util.Random(5)
    val bases = Array.fill(20)(rnd.nextLong())
    val ids = rnd.shuffle((1 to 300).map(_.toLong * 7)).toArray
    val reps = ids.map { id =>
      val ph =
        if (rnd.nextInt(3) == 0) rnd.nextLong()
        else {
          var v = bases(rnd.nextInt(bases.length))
          (0 until rnd.nextInt(4)).foreach(_ => v ^= 1L << rnd.nextInt(64))
          v
        }
      (id, ph)
    }
    val got = MediaIngest.driverComponentMinima(reps).sorted.toSeq
    // brute force: BFS components over all Hamming-<=3 pairs
    val n = reps.length
    val sortedReps = reps.sortBy(_._1)
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    for (i <- 0 until n; j <- i + 1 until n)
      if (java.lang.Long.bitCount(sortedReps(i)._2 ^ sortedReps(j)._2) <= 3) {
        adj(i) += j; adj(j) += i
      }
    val seen = Array.fill(n)(false)
    val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (i <- 0 until n if !seen(i)) {
      expected += sortedReps(i)._1 // ids ascend, so first unseen = comp min
      val q = scala.collection.mutable.Queue(i)
      seen(i) = true
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj(u).foreach { v => if (!seen(v)) { seen(v) = true; q += v } }
      }
    }
    assert(got == expected.sorted.toSeq,
      s"driver fold drifted from witness: ${got.size} vs ${expected.size} minima")
    assert(got.size < n, "fixture must actually form multi-member components")
  }
}
