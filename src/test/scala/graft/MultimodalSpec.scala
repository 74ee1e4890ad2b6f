package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing round-trip (SURVEY.md §2.9 N5): binary payloads,
  * typed metadata, decode batch shape, frame sampling geometry. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table round-trips payload bytes through binary column") {
    val media = Multimodal.mediaTable(spark, sf)
    val row = media.select(col("media_id"), col("payload")).orderBy("media_id").head()
    val doc = Tables.documents(spark, sf).orderBy("doc_id").head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") ==
      doc.getAs[String]("text"))
  }

  test("metadata struct carries typed fields and filters prune pre-decode") {
    val media = Multimodal.mediaTable(spark, sf)
    val codecs = media.select(col("meta.codec")).distinct().as[String].collect().toSet
    assert(codecs.subsetOf(Set("jpeg", "png", "wav")))
    assert(media.filter(col("meta.width") >= 64).count() == media.count())
  }

  test("decode produces fixed-length feature vectors (batch contract)") {
    val decoded = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf).limit(10))
    val feats = decoded.select("feature").as[Seq[Float]].collect()
    assert(feats.nonEmpty && feats.forall(_.length == 8))
  }

  test("decode is deterministic") {
    val m = Multimodal.mediaTable(spark, sf).limit(5)
    val a = Multimodal.decodeFeatures(m).orderBy("media_id").collect()
    val b = Multimodal.decodeFeatures(m).orderBy("media_id").collect()
    assert(a.sameElements(b))
  }

  test("frame sampling geometry: count = floor((len-frame)/stride)+1") {
    val one = Seq((1L, "x" * 100)).toDF("doc_id", "text")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"),
        struct(lit(1).as("width")).as("meta"))
    val frames = Multimodal.sampleFrames(one, frameLen = 32, stride = 16)
    assert(frames.count() == (100 - 32) / 16 + 1)
  }

  // independent dHash reimplementation sharing no code with the kernel:
  // builds the 65 bucket sums by EXPLICIT range boundaries [⌈bn/65⌉,
  // ⌈(b+1)n/65⌉) — the oracle's dual of the kernel's bucket-of-position
  private def refDhash(bytes: Array[Byte]): Long = {
    val n = bytes.length.toLong
    val sums = (0 until 65).map { b =>
      val lo = ((b * n + 64) / 65).toInt
      val hi = (((b + 1) * n + 64) / 65).toInt
      (lo until hi).map(i => (bytes(i) & 0xff).toLong).sum
    }
    (0 until 64).foldLeft(0L)((sig, b) =>
      if (sums(b + 1) > sums(b)) sig | (1L << b) else sig)
  }

  private def dhashOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.select(col("media_id"), ColumnBridge.column(graft.functions.DHash64(
      ColumnBridge.expression(col("payload")))).as("ph"))
  }

  test("DHash64 matches the independent boundary-form reference on the corpus") {
    val media = Multimodal.mediaTable(spark, sf).limit(50)
    val got = dhashOf(media).orderBy("media_id")
      .as[(Long, java.lang.Long)].collect()
    val expected = media.select("media_id", "payload").orderBy("media_id")
      .collect().map(r => (r.getLong(0),
        Option(r.getAs[Array[Byte]]("payload")).map(b =>
          java.lang.Long.valueOf(refDhash(b))).orNull))
    got.zip(expected).foreach { case ((gi, gp), (ei, ep)) =>
      assert(gi == ei && gp == ep, s"media $gi: got $gp expected $ep")
    }
    assert(got.nonEmpty)
  }

  test("DHash64 edge cases: NULL payload -> NULL, empty payload -> 0") {
    val df = Seq((1L, Some("")), (2L, None: Option[String]))
      .toDF("media_id", "text")
      .select(col("media_id"), col("text").cast("binary").as("payload"))
    val got = dhashOf(df).orderBy("media_id")
      .as[(Long, java.lang.Long)].collect().toMap
    assert(got(1L) == 0L)
    assert(got(2L) == null)
  }

  test("DHash64 locality: a localized byte edit stays within a small Hamming ball") {
    val base = ("a" * 650).getBytes
    val edited = base.clone(); edited(100) = 'z'.toByte // perturbs 1 bucket
    val h = java.lang.Long.bitCount(refDhash(base) ^ refDhash(edited))
    assert(h <= 4, s"one-bucket edit moved $h bits") // 2 adjacent compares
    // and the banded pair query detects Hamming <= 3 by pigeonhole: any
    // two signatures within 3 flips agree exactly on >= 1 of 4 bands
    val a = refDhash(base)
    val flipped = a ^ 1L ^ (1L << 20) ^ (1L << 40) // Hamming 3
    val bandsA = (0 until 4).map(b => (a >> (b * 16)) & 0xFFFFL)
    val bandsF = (0 until 4).map(b => (flipped >> (b * 16)) & 0xFFFFL)
    assert(bandsA.zip(bandsF).exists { case (x, y) => x == y })
  }

  test("q_image_neardup pairs expand signature classes exactly (hamming 0 intra)") {
    val pairs = Multimodal.qImageNearDup.fn(spark, sf)
      .filter(col("id_a") >= 0).collect()
    // every duplicate-text pair must appear at hamming 0
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().filter(_._2 != null)
    val byText = texts.groupBy(_._2).values.filter(_.length > 1)
    val expectedIntra = byText.flatMap(g =>
      g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1)))).toSet
    val gotPairs = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotZero = pairs.filter(_.getInt(2) == 0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expectedIntra.subsetOf(gotZero),
      s"${(expectedIntra -- gotZero).take(3)} missing at hamming 0")
    // symmetric sanity: no pair listed twice, ids ordered
    assert(gotPairs.size == pairs.length)
    assert(gotPairs.forall { case (x, y) => x < y })
  }
}
