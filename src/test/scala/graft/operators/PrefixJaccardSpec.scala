package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtered Jaccard join must be LOSSLESS: row-identical to the
  * naive all-co-occurring-pairs join at the same threshold (the prefix
  * filter, the length filter and the candidate-restricted verification may
  * only prune work, never results). Pinned against ngramJaccardPairs on a
  * corpus engineered to hit the filter's edges, and on the real sf0.001
  * documents table for breadth. */
class PrefixJaccardSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  private val corpus = Seq(
    // duplicate class (expandDupPairs path, intra J = 1.0)
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "the quick brown fox jumps over the lazy dog today",
    // near-dup of the class, above threshold
    3L -> "the quick brown fox jumps over the lazy cat today",
    // EXACT boundary pair: 4 shingles each, 3 shared → J = 3/5 exactly,
    // must be included by the ≥ comparison on both engines
    10L -> "aa bb cc dd ee ff",
    11L -> "aa bb cc dd ee gg",
    // below threshold: 2 of 4 shared → J = 1/3
    12L -> "aa bb cc dd zz yy",
    // same-size unrelated doc (length filter passes, verification rejects)
    13L -> "pp qq rr ss tt uu",
    // size-skewed near-dup: J capped below 3/5 by sizes alone, the
    // length filter must prune it without losing anything
    20L -> "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo",
    // shingle-less duplicates and NULL text never pair
    30L -> "too short",
    31L -> "too short",
    40L -> (null: String))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefix-filtered pairs equal the naive join on the edge-case corpus") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = rows(Dedup.prefixJaccardPairs(docs))
    val naive = rows(Dedup.ngramJaccardPairs(docs, 0.6))
    assert(got == naive,
      s"\ngot:      ${got.toSeq.sorted}\nexpected: ${naive.toSeq.sorted}")
    // the cases that make the corpus interesting actually occurred
    assert(got.contains((1L, 2L, 1.0)), "intra-class pair missing")
    assert(got.contains((10L, 11L, 0.6)), "exact-boundary J = 3/5 pair missing")
    assert(!got.exists(p => Set(12L, 13L, 20L, 30L, 31L, 40L)(p._1) ||
      Set(12L, 13L, 20L, 30L, 31L, 40L)(p._2)),
      "below-threshold / shingle-less docs must not pair")
  }

  test("prefix-filtered pairs equal the naive join on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = rows(Dedup.prefixJaccardPairs(docs))
    val naive = rows(Dedup.ngramJaccardPairs(docs, 0.6))
    assert(got == naive)
    assert(got.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
  }
}
