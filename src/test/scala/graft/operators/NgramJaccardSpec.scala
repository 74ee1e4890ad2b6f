package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The hashed co-occurrence Jaccard listing (r8 production form of
  * q_ngram_jaccard: 64-bit shingle-hash candidates whose co-occurrence
  * count IS the exact intersection — verification fused into the
  * aggregate) must be row-identical to the naive string-shingle join
  * at the same threshold — the hash keys, the lossless length filter and
  * the fused count may only change the WORK, never the results. Pinned
  * on a corpus engineered to sit on the t = 1/20 boundary and on the real
  * sf0.001 documents table for breadth. */
class NgramJaccardSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  // helper texts: distinct single-use tokens so shingle sets are exactly
  // the sliding 3-gram windows with no accidental cross-doc overlap
  private val corpus = Seq(
    // duplicate class (expandDupPairs path, intra J = 1.0)
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "the quick brown fox jumps over the lazy dog today",
    // EXACT boundary: A has 10 shingles, B 11, sharing exactly "x y z"
    // → i = 1, union = 20, J = 1/20 — must survive the ≥ comparison in
    // both the integer (20·i ≥ union) and the naive double form
    10L -> "a1 a2 a3 a4 a5 a6 a7 a8 a9 x y z",
    11L -> "x y z b1 b2 b3 b4 b5 b6 b7 b8 b9 b10",
    // just below: 12 shingles sharing only "x y z" with doc 10
    // → i = 1, union = 21, J = 1/21 < 1/20 — excluded by both forms
    12L -> "x y z c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11",
    // length-filter equality edge: 2 shingles vs 40 shingles
    // (20·min = max exactly) sharing both of the small doc's shingles
    // → i = 2, union = 40, J = 1/20 — the filter must NOT prune it
    20L -> "w1 w2 w3 w4",
    21L -> ("w1 w2 w3 w4 " + (1 to 38).map(i => s"d$i").mkString(" ")),
    // one past the filter edge: 41 shingles sharing the same 2
    // → 20·min < max prunes it, and indeed J = 2/41 < 1/20 — lossless
    22L -> ("w1 w2 w3 w4 " + (1 to 39).map(i => s"e$i").mkString(" ")),
    // shingle-less duplicates and NULL text never pair
    30L -> "too short",
    31L -> "too short",
    40L -> (null: String))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("hashed pairs equal the naive join on the boundary corpus") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = rows(Dedup.ngramJaccardPairs(docs, 1, 20))
    val naive = rows(Dedup.naiveNgramJaccardPairs(docs, 0.05))
    assert(got == naive,
      s"\ngot:      ${got.toSeq.sorted}\nexpected: ${naive.toSeq.sorted}")
    // the cases that make the corpus interesting actually occurred
    assert(got.contains((1L, 2L, 1.0)), "intra-class pair missing")
    assert(got.exists(p => p._1 == 10L && p._2 == 11L),
      "exact-boundary J = 1/20 pair missing")
    assert(got.exists(p => p._1 == 20L && p._2 == 21L),
      "length-filter-equality J = 1/20 pair missing")
    assert(!got.exists(p => p._1 == 10L && p._2 == 12L),
      "J = 1/21 pair must stay below threshold")
    assert(!got.exists(p => Set(22L, 30L, 31L, 40L)(p._1) ||
      Set(22L, 30L, 31L, 40L)(p._2)),
      "pruned / shingle-less docs must not pair")
  }

  test("hashed pairs equal the naive join on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = rows(Dedup.ngramJaccardPairs(docs, 1, 20))
    val naive = rows(Dedup.naiveNgramJaccardPairs(docs, 0.05))
    assert(got == naive)
    assert(got.nonEmpty, "sf0.001 corpus should contain co-occurring pairs")
  }
}
