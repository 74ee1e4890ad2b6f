package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The sorted-neighborhood operator must equal a naive driver-side
  * reimplementation of its contract: block by (lang, 4-char key block),
  * sort by (32-char normalized key, doc_id), pair each doc with its next 3
  * neighbors, score with exact 3-gram Jaccard. Checked on the sf0.001
  * corpus and on a crafted fixture that exercises blocking misses,
  * shingle-less docs and NULL text. */
class SnmSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session

  private def witness(rows: Seq[(Long, String, String)]): Set[(Long, Long, Double)] = {
    def norm(t: String): String =
      if (t == null) "" else t.trim.toLowerCase.replaceAll("\\s+", " ")
    def shingleSet(t: String): Set[String] = {
      if (t == null) return Set.empty
      val ts = t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    val keyed = rows.map { case (id, lang, t) =>
      val k = norm(t).take(32)
      (id, lang, k, k.take(4), shingleSet(t))
    }
    (for {
      (_, grp) <- keyed.groupBy(r => (r._2, r._4)).toSeq
      sorted = grp.sortBy(r => (r._3, r._1))
      (a, ia) <- sorted.zipWithIndex
      j <- 1 to 3
      if ia + j < sorted.length
      b = sorted(ia + j)
      i = (a._5 & b._5).size.toLong
      u = a._5.size.toLong + b._5.size - i
      if u > 0
    } yield (math.min(a._1, b._1), math.max(a._1, b._1),
      ((20000L * i + u) / (2L * u)).toDouble / 10000)).toSet
  }

  test("SNM pairs equal the naive witness on the sf0.001 corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val got = Dedup.qSnmPairs.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rows = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val expected = witness(rows)
    assert(got == expected,
      s"sizes got=${got.size} expected=${expected.size}; " +
        s"missing=${(expected -- got).take(3)}; extra=${(got -- expected).take(3)}")
    assert(got.nonEmpty, "sf0.001 should produce SNM candidates")
    // the window actually discriminates: not every candidate pair scores 0
    assert(got.exists(_._3 > 0.0) && got.exists(_._3 == 0.0))
  }

  test("crafted fixture: flooded block stays balanced; NULL text, " +
      "shingle-less docs, NULL lang and cross-block misses behave") {
    import spark.implicits._
    // 10^4 docs flooding ONE (lang, 4-char block) — and, harder, sharing
    // an IDENTICAL 32-char sort key, the case adaptive key-lengthening
    // cannot split; the range partitioner balances on the trailing unique
    // doc_id regardless (VERDICT r6 #3)
    val flood = (0L until 10000L).map { i =>
      (i, "en",
        s"the flooded boilerplate opening stays identical for thirty-two " +
          s"chars while tail $i varies ${i % 7} ${i % 11} ${i % 13}")
    }
    val edges = Seq[(Long, String, String)](
      (20000L, "en", null), // NULL text: empty key + empty shingle set
      (20001L, "en", "tiny"), // shingle-less, 1 token
      (20002L, "en", "ab cd"), // shingle-less, 2 tokens
      // NULL lang pair: both engines must group them ('' sentinel)
      (20003L, null, "null lang doc body words one two three"),
      (20004L, null, "null lang doc body words one two three four"),
      // cross-block near-dups: same text modulo the first word lands in
      // different 4-char blocks — the documented blocking MISS
      (20005L, "en", "alpha shared middle section of text that matches fully"),
      (20006L, "en", "omega shared middle section of text that matches fully"))
    val rows = flood ++ edges
    val docs = rows.toDF("doc_id", "lang", "text")
    val got = graft.operators.Dedup.snmPairsFrom(spark, docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = witness(rows)
    assert(got == expected,
      s"sizes got=${got.size} expected=${expected.size}; " +
        s"missing=${(expected -- got).take(3)}; extra=${(got -- expected).take(3)}")
    // the NULL-lang docs pair with each other, never dropped (ADVICE r6)
    assert(got.exists(p => p._1 == 20003L && p._2 == 20004L && p._3 > 0.5))
    // the cross-block near-dup is a documented miss
    assert(!got.exists(p => p._1 == 20005L && p._2 == 20006L))
    // flood pairs exist and score high (consecutive tails share shingles)
    assert(got.count(p => p._1 < 10000L && p._2 < 10000L) >= 3 * 10000 - 6)
    // the BALANCE pin: no partition of the range sort holds more than a
    // fraction of the flooded block (the r6 per-block window put all 10^4
    // rows in ONE partition's sort). AQE's size-based coalescing folds
    // this ~1 MB fixture into one partition (correct — it coalesces by
    // bytes, not rows, so a 100 TB flood stays split); turn it off for
    // the measurement so the row-level split is observable.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val sizes =
      try graft.operators.Dedup.snmSorted(spark, docs).rdd
        .mapPartitions(it => Iterator(it.size)).collect()
      finally
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert(sizes.sum == rows.size)
    // test session runs 4 shuffle partitions: fair share ~n/4, sampled
    // boundaries wobble — n/2 still proves the flood was split, where the
    // r6 shape put all 10^4 flood rows in ONE partition
    assert(sizes.max <= rows.size / 2,
      s"flooded block not split by the range sort: max=${sizes.max} " +
        s"of n=${rows.size} across ${sizes.length} partitions")
  }
}
