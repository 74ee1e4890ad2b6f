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

  test("collapsed substring-overlap pairs equal the naive fingerprint join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // duplicates + a shared-prefix near-dup + short and NULL texts — the
    // same classes of edge the jaccard test exercises, at fingerprint
    // granularity (the 2-token texts normalize to one 8-gram → 1
    // fingerprint → under the ≥2 floor)
    val docs = (corpus ++ Seq(30L -> (null: String)))
      .toDF("doc_id", "text")
    val got = Dedup.substringOverlapPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive all-member join on the SAME kernel: the spec checks the
    // collapse/reconstruction, the kernel itself is oracle-pinned by
    // q_winnow_fingerprint
    val sh = docs.select(col("doc_id"),
      explode(Dedup.winnowFps(col("text"))).as("fp"))
    val naive = sh.as("x")
      .join(sh.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == naive,
      s"\ngot:      ${got.toSeq.sorted}\nexpected: ${naive.toSeq.sorted}")
    // the interesting cases occurred: intra-class pairs at full set size,
    // and the single-fingerprint duplicates (20, 21) stayed unpaired
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2L),
      "intra-class substring pair missing")
    assert(!got.exists(p => p._1 == 20L || p._2 == 21L),
      "sub-floor duplicates must not pair")
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
