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
}
