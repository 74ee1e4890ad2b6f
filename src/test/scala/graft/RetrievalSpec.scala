package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Law pins for the hybrid-retrieval / mixing pack (Retrieval.scala).
  * The DuckDB oracles pin cross-engine value equality; these tests pin
  * the SEMANTIC laws the oracles can't express: fusion monotonicity,
  * sampling-rate sanity, cap enforcement, histogram conservation.
  */
class RetrievalSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  test("q_hybrid_search: fused list is consistent with its branch ranks") {
    val out = Retrieval.qHybridSearch.fn(spark, sf001).collect()
    assert(out.nonEmpty && out.length <= 20)
    // rrf is exactly the sum of the two branch contributions
    out.foreach { r =>
      def contrib(i: Int): Long =
        if (r.isNullAt(i)) 0L else 1000000000000L / (60L + r.getInt(i))
      assert(r.getLong(1) == contrib(2) + contrib(3),
        s"rrf mismatch for row $r")
      assert(!(r.isNullAt(2) && r.isNullAt(3)),
        "a fused row must come from at least one branch")
    }
    // descending fused order with doc_id tiebreak
    val keys = out.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(keys == keys.sorted, "output not in (rrf desc, doc_id) order")
    // a doc ranked by BOTH branches outscores one ranked by a single
    // branch at equal-or-worse ranks: 2 terms at rank<=100 > 1 term at
    // rank 1 is not guaranteed, but sum strictly exceeds either term
    out.filter(r => !r.isNullAt(2) && !r.isNullAt(3)).foreach { r =>
      def contrib(i: Int): Long = 1000000000000L / (60L + r.getInt(i))
      assert(r.getLong(1) > contrib(2) && r.getLong(1) > contrib(3))
    }
  }

  test("q_temperature_mix: rates respect the temperature ordering") {
    val rows = Retrieval.qTemperatureMix.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val byLang = rows.map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    byLang.values.foreach { case (n, t, kept) =>
      assert(t >= 0 && t <= 65536)
      assert(kept >= 0 && kept <= n)
    }
    // temperature flattening: a larger language never gets a HIGHER
    // sampling threshold (rate ∝ sqrt(n)/n is decreasing in n)
    val sorted = byLang.values.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((n1, t1, _), (n2, t2, _)) if n1 < n2 => assert(t1 >= t2,
        s"larger language got higher threshold: n=$n1 t=$t1 vs n=$n2 t=$t2")
      case _ =>
    }
    // kept ≈ threshold/65536 · n within binomial noise (4σ)
    byLang.values.foreach { case (n, t, kept) =>
      val rate = math.min(1.0, t / 65536.0)
      val sigma = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept - rate * n) <= 4 * sigma + 1,
        s"kept=$kept far from expectation ${rate * n} (n=$n)")
    }
  }

  test("q_temperature_mix: keep decisions are doc-stable (restartable)") {
    // the same doc set minus nothing → identical kept counts run to run
    val a = Retrieval.qTemperatureMix.fn(spark, sf001).collect().toSeq
    val b = Retrieval.qTemperatureMix.fn(spark, sf001).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("q_source_cap: at most 10 per source, ranks dense from 1") {
    val out = Retrieval.qSourceCap.fn(spark, sf001)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) <= 10)
      assert(r.getInt(2) == 1)
      assert(r.getInt(3) == r.getLong(1), s"ranks not dense: $r")
    }
    // sources smaller than the cap survive whole
    val perSource = Tables.documents(spark, sf001)
      .groupBy("source").agg(count(lit(1)).as("total")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val total = perSource(r.getString(0))
      assert(r.getLong(1) == math.min(total, 10L))
    }
  }

  test("q_length_histogram: buckets conserve docs and bound token sums") {
    val rows = Retrieval.qLengthHistogram.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getLong(1)).sum
    val withTok = Tables.documents(spark, sf001)
      .select(size(filter(split(trim(lower(col("text"))), "\\s+"),
        x => x =!= lit(""))).as("ntok"))
      .filter(col("ntok") > 0).count()
    assert(totalDocs == withTok, "histogram loses or invents documents")
    rows.foreach { case Row(bucket: Int, n: Long, toks: Long, share: Double) =>
      val lo = 1L << bucket
      val hi = (1L << (bucket + 1)) - 1
      assert(toks >= lo * n && toks <= hi * n,
        s"bucket $bucket token sum $toks outside [$lo,$hi]·$n")
      assert(share >= 0.0 && share <= 1.0)
    }
    val shares = rows.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) <= rows.length * 1e-4 + 1e-9)
  }

  test("q_inverted_index: postings reconstruct the exact term-document matrix") {
    val out = Retrieval.qInvertedIndex.fn(spark, sf001).collect()
    assert(out.nonEmpty)
    // independent witness index from the raw text
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val occurrences = docs.flatMap { case (id, t) =>
      Option(t).toSeq.flatMap(
        _.replaceAll("^ +| +$", "").toLowerCase.split("\\s+")
          .filter(_.nonEmpty).map(_ -> id))
    }
    val wantPostings = occurrences.distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val wantCf = occurrences.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // segment postings: ascending within segment, segment == doc_id/128,
    // df/cf constant per term, concatenation across segments == full list
    val byTerm = out.groupBy(_.getString(0))
    assert(byTerm.keySet == wantPostings.keySet, "vocabulary mismatch")
    byTerm.foreach { case (term, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      val ids = sorted.flatMap(_.getString(4).split(",").map(_.toLong)).toSeq
      assert(ids == wantPostings(term), s"$term postings $ids")
      sorted.foreach { r =>
        val seg = r.getInt(1)
        r.getString(4).split(",").map(_.toLong).foreach { id =>
          assert(id / 128 == seg, s"$term doc $id outside segment $seg")
        }
        assert(r.getLong(2) == wantPostings(term).length.toLong,
          s"$term df ${r.getLong(2)}")
        assert(r.getLong(3) == wantCf(term), s"$term cf ${r.getLong(3)}")
      }
    }
  }
}
