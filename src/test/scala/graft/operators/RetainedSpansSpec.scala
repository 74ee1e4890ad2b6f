package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Witness laws for q_retained_spans (Lee-et-al.-style exact-substring
  * dedup): a naive driver-side reference implementation (plain Scala, no
  * Spark) must agree row-for-row on crafted corpora and on a slice of the
  * real sf0.001 table; exact copies retain nothing; an aligned embedded
  * paragraph drops exactly its region; spans partition cleanly. */
class RetainedSpansSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  // ---- naive reference: same contract, zero shared code with the
  // Catalyst kernel beyond the published constants (k=8, w=16, base) ----
  private val K = 8
  private val W = 16
  private val Base = 1000003L

  private def norm(text: String): String =
    Option(text).getOrElse("").toLowerCase.filter(_.isLetterOrDigit)

  /** (fp, 1-based gram start) per strided window, rightmost min. */
  private def picks(s: String): Seq[(Long, Int)] = {
    if (s.length < K) return Seq.empty
    val n = s.length - K + 1
    val hs = new Array[Long](n)
    var h = 0L; var pow = 1L
    for (i <- 0 until K) { h = h * Base + s.charAt(i); if (i < K - 1) pow *= Base }
    hs(0) = h
    for (i <- 1 until n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + K - 1); hs(i) = h
    }
    (0 until n by W).map { st =>
      val end = math.min(st + W, n)
      var m = st
      for (j <- st + 1 until end) if (hs(j) <= hs(m)) m = j
      (hs(m), m + 1)
    }
  }

  private def naive(corpus: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val byDoc = corpus.map { case (id, t) => id -> norm(t) }
    val owner = scala.collection.mutable.Map.empty[Long, Long]
    for ((id, s) <- byDoc.sortBy(_._1); (fp, _) <- picks(s))
      if (!owner.contains(fp) || owner(fp) > id) owner(fp) = id
    byDoc.filter(_._2.nonEmpty).flatMap { case (id, s) =>
      val drops = picks(s).collect {
        case (fp, st) if owner(fp) < id =>
          val widx = (st - 1) / W
          (widx * W + 1, math.min(widx * W + W + K - 1, s.length))
      }.sorted
      // merge overlapping/adjacent, then complement within [1, len]
      val merged = drops.foldLeft(List.empty[(Int, Int)]) {
        case ((ms, me) :: rest, (ds, de)) if ds <= me + 1 =>
          (ms, math.max(me, de)) :: rest
        case (acc, d) => d :: acc
      }.reverse
      val bounds = (0, 0) +: merged :+ ((s.length + 1, s.length + 1))
      bounds.sliding(2).collect {
        case Seq((_, pe), (ns, _)) if pe + 1 <= ns - 1 =>
          (id, (pe + 1).toLong, (ns - 1).toLong)
      }.toSeq
    }.sortBy(r => (r._1, r._2))
  }

  private def run(corpus: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Dedup.retainedSpans(corpus.toDF("doc_id", "text"))
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  // 32 + 80 + 40 alnum chars; distinctive content so no accidental fps
  private val u1 = "q1w2e3r4t5y6u7i8o9p0a1s2d3f4g5h6"
  private val para = ("thequickbrownfoxjumpsoverthelazydog" +
    "andseventeenpurpleelephantsmarchnorthwardpastmidnight").take(80)
  private val u2 = "z9x8c7v6b5n4m3k2j1h0g9f8d7s6a5p4o3i2u1y0"
  require(u1.length == 32 && para.length == 80 && u2.length == 40)

  test("exact copy of an earlier doc retains nothing; the original everything") {
    val corpus = Seq(1L -> para, 2L -> para)
    val got = run(corpus)
    assert(got == Seq((1L, 1L, 80L)), s"got $got")
    assert(got == naive(corpus))
  }

  test("aligned embedded paragraph drops exactly its region") {
    // u1 is 32 chars = 2 full windows, so the paragraph's grams align
    // with doc 1's windows and every interior window is dropped
    val corpus = Seq(1L -> para, 3L -> (u1 + para + u2))
    val got = run(corpus)
    val doc3 = got.filter(_._1 == 3L)
    assert(got.filter(_._1 == 1L) == Seq((1L, 1L, 80L)))
    assert(doc3.size == 2, s"expected head+tail spans, got $doc3")
    assert(doc3.head == ((3L, 1L, 32L)), s"head span: ${doc3.head}")
    assert(doc3(1)._3 == 152L && doc3(1)._2 >= 104L,
      s"tail span must cover u2: ${doc3(1)}")
    assert(got == naive(corpus), s"\ngot:   $got\nnaive: ${naive(corpus)}")
  }

  test("chain ownership: first occurrence wins across three docs") {
    val corpus = Seq(
      5L -> (para + u2), // owns para's and u2's fps
      6L -> (u1 + para), // para region dropped, u1 head retained
      7L -> (u1 + u2)) // both halves owned elsewhere (5 and 6)
    val got = run(corpus)
    assert(got == naive(corpus), s"\ngot:   $got\nnaive: ${naive(corpus)}")
    assert(got.filter(_._1 == 5L) == Seq((5L, 1L, 120L)))
    // doc 6 keeps (at least) the aligned u1 head
    assert(got.filter(_._1 == 6L).headOption.contains((6L, 1L, 32L)))
  }

  test("naive reference agrees on the sf0.001 corpus (and NULL/short texts)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toSeq
    val corpus = docs ++ Seq(900000L -> "", 900001L -> (null: String),
      900002L -> "short")
    val got = run(corpus)
    val exp = naive(corpus)
    assert(got == exp,
      s"mismatch: got ${got.size} spans, naive ${exp.size}")
    // structural law: per-doc spans are sorted, disjoint, in-bounds
    got.groupBy(_._1).foreach { case (id, spans) =>
      val ordered = spans.sortBy(_._2)
      assert(ordered == spans)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 < b._2, s"overlap in doc $id: $a $b")
        case _ =>
      }
      assert(ordered.head._2 >= 1 && ordered.forall(s => s._2 <= s._3))
    }
  }
}
