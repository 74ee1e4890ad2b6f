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
    val got = Dedup.ngramJaccardPairs(docs, 1, 2)
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

  test("substring best match equals the pair-listing argmax (no fp capped)") {
    import spark.implicits._
    // add a distinctive long-shared-run pair so the output is nonempty
    // beyond the duplicate class
    val docs = (corpus ++ Seq(
      30L -> "zq distinctive shared winnowing passage runs long enough to fingerprint twice alpha",
      31L -> "zq distinctive shared winnowing passage runs long enough to fingerprint twice omega",
      32L -> (null: String)))
      .toDF("doc_id", "text")
    // at this scale no fingerprint reaches the df cap, so best-match must
    // be EXACTLY the per-doc argmax (max count, then min neighbor) of the
    // already-verified pair listing
    val pairs = Dedup.substringOverlapPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pairs
      .flatMap { case (a, b, n) => Seq((a, b, n), (b, a, n)) }
      .groupBy(_._1).map { case (id, cs) =>
        val best = cs.minBy(c => (-c._3, c._2))
        (id, best._2, best._3)
      }.toSet
    val got = Dedup.substringBestMatch(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"\ngot:      ${got.toSeq.sorted}\nexpected: ${expected.toSeq.sorted}")
    assert(got.exists(p => p._1 == 30L && p._2 == 31L), "distinctive pair missing")
    assert(got.exists(p => p._1 == 1L && p._2 == 2L), "duplicate sibling missing")
  }

  test("stop-fingerprint cap: boilerplate floods stay out of best match") {
    import spark.implicits._
    // 80 docs sharing a long verbatim boilerplate run (every pure-
    // boilerplate fingerprint lands in all 80 distinct texts -> df 80 >
    // 64, dropped); the unique id prefix shares at most ONE 8-gram with
    // any other doc (same-last-digit ids), under the >= 2 floor
    val boiler = "this legal disclaimer boilerplate paragraph repeats " +
      "verbatim across every page of the export corpus and is long " +
      "enough to produce several winnowing fingerprint windows"
    val flood = (0L until 80L).map(i => (100L + i) -> s"xx${i}yy $boiler")
    val control = Seq(
      500L -> "uq genuinely distinctive shared passage appearing exactly twice with enough length alpha",
      501L -> "uq genuinely distinctive shared passage appearing exactly twice with enough length omega")
    val docs = (flood ++ control).toDF("doc_id", "text")
    // the LISTING pays the quadratic: every flood pair shares >= 2
    // boilerplate fingerprints
    val listing = Dedup.substringOverlapPairs(docs).collect()
    assert(listing.count(r => r.getLong(0) >= 100L && r.getLong(0) < 200L &&
      r.getLong(1) >= 100L && r.getLong(1) < 200L) == 80 * 79 / 2,
      "flood should pair quadratically in the listing")
    // the production twin drops the flooded fingerprints: candidates are
    // bounded and no flood doc matches through boilerplate alone
    val got = Dedup.substringBestMatch(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!got.exists(p => p._1 >= 100L && p._1 < 200L),
      s"flood docs matched through capped boilerplate: ${got.filter(_._1 >= 100L).take(5).toSeq}")
    assert(got.exists(p => p._1 == 500L && p._2 == 501L) &&
      got.exists(p => p._1 == 501L && p._2 == 500L),
      "distinctive control pair must survive the cap")
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
    val pairs = Dedup.ngramJaccardPairs(docs, 1, 2).collect()
    assert(!pairs.exists(r => r.getLong(0) >= 30L || r.getLong(1) >= 30L))
  }
}
