package graft.operators

import graft.Tables

/** The df-capped edge builder (VERDICT r8 #6): row identity with the
  * exact form off-flood, bounded candidates + loud overflow accounting
  * on a boilerplate flood. */
class CappedEdgesSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("capped edge build is row-identical to exact on the fixture corpus, zero overflow") {
    val docs = Tables.documents(spark, sf)
    val members = Dedup.dupClasses(docs)
    val reps = Dedup.repDocsOf(docs, members)
    val (exact, _) = Dedup.prefixRepJaccardPairs(reps, 1, 2)
    val (capped, _, overflow) =
      Dedup.prefixRepJaccardPairsCapped(reps, 1, 2, 64L)
    assert(pairsOf(capped) == pairsOf(exact))
    val o = overflow.head()
    assert(o.getLong(0) == 0L && o.getLong(1) == 0L, s"overflow $o")
  }

  test("boilerplate flood: candidates bounded, overflow reported, output still exact") {
    // 100 docs sharing a 16-token boilerplate block plus 12 unique tokens
    // each: J between any two ≈ 14/(52-14) = 0.37 < 1/2, so the EXACT
    // edge set is empty — but the 14 shared shingles have df = 100, and
    // the rarity prefix (n - ceil(n/2) + 1 = 14 of 26 shingles) still
    // admits ~2 boilerplate shingles per doc, so the uncapped candidate
    // join pays ~2 * C(100,2) verify-doomed rows. The df cap (64) drops
    // exactly the boilerplate shingles from candidate generation and
    // REPORTS the mass it skipped.
    val common = (1 to 16).map(i => s"common$i").mkString(" ")
    val flood = (0 until 100).map { d =>
      (d.toLong, common + " " + (1 to 12).map(i => s"u${d}x$i").mkString(" "))
    }.toDF("doc_id", "text")
    val members = Dedup.dupClasses(flood)
    val reps = Dedup.repDocsOf(flood, members)
    val (exact, _) = Dedup.prefixRepJaccardPairs(reps, 1, 2)
    val (capped, _, overflow) =
      Dedup.prefixRepJaccardPairsCapped(reps, 1, 2, 64L)
    assert(pairsOf(exact).isEmpty, "flood pairs must fail J >= 1/2 verify")
    assert(pairsOf(capped) == pairsOf(exact))
    val o = overflow.head()
    // all 14 common-only shingles are capped; each accounts C(100,2) slots
    assert(o.getLong(0) == 14L, s"capped shingles: $o")
    assert(o.getLong(1) == 14L * (100L * 99L / 2L), s"dropped slots: $o")
  }

  test("a real near-dup pair NOT carried by boilerplate survives the cap") {
    // two 40-token docs differing in one word (J >> 1/2, all shingles
    // df <= 2) among the flood: the cap must not lose the edge
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 39).map(i => s"w$i").mkString(" ") + " zzz"
    val common = (1 to 16).map(i => s"common$i").mkString(" ")
    val docs = ((0 until 50).map { d =>
      (d.toLong, common + " " + (1 to 12).map(i => s"u${d}x$i").mkString(" "))
    } ++ Seq(1000L -> base, 1001L -> near)).toDF("doc_id", "text")
    val members = Dedup.dupClasses(docs)
    val reps = Dedup.repDocsOf(docs, members)
    val (capped, _, overflow) =
      Dedup.prefixRepJaccardPairsCapped(reps, 1, 2, 8L)
    assert(pairsOf(capped) == Set((1000L, 1001L)))
    assert(overflow.head().getLong(0) > 0, "flood shingles must be capped")
  }

  test("q_dedup_groups_capped equals q_dedup_groups plus the zero summary row") {
    val exact = Pipeline.qDedupGroups.fn(spark, sf)
      .as[(Long, Long)].collect().toSeq
    val capped = Pipeline.qDedupGroupsCapped.fn(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(capped.head == (-1L, 0L), s"summary row: ${capped.head}")
    assert(capped.tail == exact)
  }
}
