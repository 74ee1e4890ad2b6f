package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filtered Jaccard join must be LOSSLESS: row-identical to the
  * naive all-co-occurring-pairs join at the same threshold (the prefix
  * filter, the length filter and the candidate-restricted verification may
  * only prune work, never results). Pinned against naiveNgramJaccardPairs on a
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
    val naive = rows(Dedup.naiveNgramJaccardPairs(docs, 0.6))
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
    val naive = rows(Dedup.naiveNgramJaccardPairs(docs, 0.6))
    assert(got == naive)
    assert(got.nonEmpty, "sf0.001 corpus should contain near-dup pairs")
  }

  test("t=1/2 rep pairs (dedup-group edges) equal the naive rep join") {
    import spark.implicits._
    // the dedup-group edge builder runs prefixRepJaccardPairs at t = 1/2;
    // pin pair-set identity against the naive shingle-join repJaccardPairs
    // on the edge-case corpus plus a J = 1/2 EXACT boundary pair
    // (J = 1/2 ⟺ 3i = nx+ny: 6 shingles each, 4 shared) and on sf0.001
    val boundary = Seq(
      50L -> "w1 w2 w3 w4 w5 w6 xx yy",  // 6 shingles, 4 shared with 51
      51L -> "w1 w2 w3 w4 w5 w6 zz qq")  // i=4, u=8 ⇒ J=1/2 exactly
    val docs = (corpus ++ boundary).toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val members = Dedup.dupClasses(docs)
    val (gotPairs, gotShingled) =
      Dedup.prefixRepJaccardPairs(Dedup.repDocsOf(docs, members), 1, 2)
    val (naivePairs, naiveShingled) = Dedup.repJaccardPairs(docs, members, 0.5)
    assert(pairSet(gotPairs) == pairSet(naivePairs),
      s"\ngot:      ${pairSet(gotPairs).toSeq.sorted}" +
      s"\nexpected: ${pairSet(naivePairs).toSeq.sorted}")
    assert(pairSet(gotPairs).contains((50L, 51L)),
      "exact-boundary J = 1/2 edge missing")
    assert(gotShingled.collect().map(_.getLong(0)).toSet ==
      naiveShingled.collect().map(_.getLong(0)).toSet)

    val sf = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val m2 = Dedup.dupClasses(sf)
    val (g2, _) = Dedup.prefixRepJaccardPairs(Dedup.repDocsOf(sf, m2), 1, 2)
    val (n2, _) = Dedup.repJaccardPairs(sf, m2, 0.5)
    assert(pairSet(g2) == pairSet(n2))
    assert(pairSet(g2).nonEmpty, "sf0.001 should contain J >= 1/2 rep edges")
  }

  test("hash-shingle kernels: sorted-distinct xxhash64 law, merge = intersect") {
    import org.apache.spark.sql.functions._
    // WordShingleHashes must equal sorted-distinct xxhash64 over the
    // string shingles (the declarative twin), and the two-pointer merge
    // must equal array_intersect size on every sf0.001 near-dup pair
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
    val mismatch = docs.select(
        Dedup.shingleHashes(col("text")).as("got"),
        array_sort(array_distinct(
          transform(Dedup.shingles(col("text")), s => xxhash64(s)))).as("want"))
      .filter(col("got") =!= col("want"))
      .count()
    assert(mismatch == 0, s"$mismatch docs with kernel/declarative drift")

    val arr = docs.limit(40)
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("h"))
    val pairs = arr.as("a").join(arr.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.sortedIntersectSize(col("a.h"), col("b.h")).as("got"),
        size(array_intersect(col("a.h"), col("b.h"))).as("want"))
    assert(pairs.filter(col("got") =!= col("want")).count() == 0,
      "two-pointer merge diverged from array_intersect")
    assert(pairs.filter(col("got") > 0).count() > 0,
      "law base should contain intersecting pairs")
  }
}
