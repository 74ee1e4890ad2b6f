package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The exact-duplicate pre-collapse must reconstruct EXACTLY the pair set
  * the naive all-member join would emit — intra-class pairs at J = 1.0,
  * cross-class pairs inheriting the representative similarity, and
  * shingle-less duplicates excluded (the naive shingle join can't pair
  * them). Checked against a brute-force Scala reimplementation on a
  * corpus built to hit every case. */
class DupCollapseSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  private val corpus = Seq(
    // a 3-copy duplicate class with enough tokens to shingle
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "the quick brown fox jumps over the lazy dog today",
    3L -> "the quick brown fox jumps over the lazy dog today",
    // a near-duplicate of the class (shares most shingles, not all)
    4L -> "the quick brown fox jumps over the lazy cat today",
    // unrelated text
    10L -> "completely different words appear in this entirely separate one",
    // a duplicated SHINGLE-LESS class (2 tokens → zero 3-gram shingles):
    // identical, but the naive join can never pair them
    20L -> "too short",
    21L -> "too short")

  private def shingleSet(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
  }

  test("collapsed n-gram pairs equal the brute-force pair set") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // brute force over every member pair, naive-join semantics: pairs
    // share ≥1 shingle and pass the threshold
    val expected = (for {
      (ia, ta) <- corpus
      (ib, tb) <- corpus
      if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      inter = (sa & sb).size
      if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (ia, ib, math.rint(j * 10000) / 10000)).toSet
    assert(got == expected,
      s"\ngot:      ${got.toSeq.sorted}\nexpected: ${expected.toSeq.sorted}")
    // the cases that make this corpus interesting actually occurred:
    assert(expected.contains((1L, 2L, 1.0)), "intra-class pair missing")
    assert(expected.exists(p => p._1 == 1L && p._2 == 4L && p._3 < 1.0),
      "cross-class near-dup pair missing")
    assert(!got.exists(p => p._1 == 20L || p._2 == 21L),
      "shingle-less duplicates must not pair")
  }

  test("NULL-text docs survive the collapse as singletons") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // md5(NULL) is NULL; an equi-join on the fingerprint would silently
    // drop these docs from members (and thus from group outputs)
    val docs = (corpus ++ Seq(30L -> (null: String), 31L -> (null: String)))
      .toDF("doc_id", "text")
    val members = Dedup.dupClasses(docs)
    assert(members.count() == corpus.size + 2)
    val nulls = members.filter(col("doc_id") >= 30L).collect()
    assert(nulls.length == 2)
    assert(nulls.forall(_.getAs[Long]("__rep") == 30L),
      "NULL texts should class together under the sentinel fingerprint")
    // the pair graph still never pairs them (zero shingles)
    val pairs = Dedup.ngramJaccardPairs(docs, 0.5).collect()
    assert(!pairs.exists(r => r.getLong(0) >= 30L || r.getLong(1) >= 30L))
  }
}
