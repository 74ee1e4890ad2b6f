package graft

import org.apache.spark.sql.functions._
import graft.operators.{Selection, TextOps}

/** Behavioral laws for the data-selection pack (SURVEY.md §2.9 N16-N17).
  * The DuckDB oracles own the arithmetic; these pin the semantic contracts
  * the oracle can't express: set membership, feature accounting against an
  * independent computation, ntile balance/monotonicity, and composition
  * with the unigram-LM operator the bucketing reuses.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("importance weights score exactly the raw set, with exact feature accounting") {
    val out = Selection.qImportanceWeights.fn(spark, sf)
      .select("doc_id", "n_features", "score_q", "avg_lr_q4")
      .as[(Long, Int, Long, Long)].collect()
    // the target exemplars are never scored
    assert(out.forall(_._1 % 20 != 0))
    // avg_lr_q4 is the pinned pure-IEEE derivation of the integer score
    out.foreach { case (id, nf, sq, avg) =>
      val want = math.floor(sq.toDouble / 1048576 / nf * 10000 + 0.5).toLong
      assert(avg == want, s"doc $id avg_lr_q4 $avg vs $want")
    }
    // the scores separate: not every doc collapses to the same weight
    assert(out.map(_._3).distinct.length > 1)
    // n_features = unigrams + bigrams = 2n-1, checked against an
    // independent per-doc token count (NULL-text docs emit no features
    // and must be absent)
    val nToks = Tables.documents(spark, sf)
      .select(col("doc_id"),
        coalesce(size(TextOps.tokens(lower(col("text")))), lit(-1)).as("n"))
      .as[(Long, Int)].collect().toMap
    val rawWithText = nToks.count { case (id, n) => id % 20 != 0 && n >= 1 }
    assert(out.length == rawWithText, "one scored row per raw non-NULL doc")
    out.foreach { case (id, nf, _, _) =>
      assert(nf == 2 * nToks(id) - 1, s"doc $id: $nf features for ${nToks(id)} tokens")
    }
  }

  test("importance weights are deterministic") {
    val a = Selection.qImportanceWeights.fn(spark, sf).collect()
    val b = Selection.qImportanceWeights.fn(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("perplexity terciles are balanced, monotone, and reuse the unigram LM") {
    val out = Selection.qPerplexityBuckets.fn(spark, sf)
      .select("doc_id", "lang", "perplexity", "tercile", "ppl_bucket")
      .as[(Long, String, Double, Int, String)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._2).values.foreach { docs =>
      // ntile balance: tile sizes differ by at most 1
      val sizes = docs.groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3)))
      if (docs.length >= 3)
        assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
      // monotone: head ≤ middle ≤ tail on the rounded perplexity
      def vals(t: Int) = docs.filter(_._4 == t).map(_._3)
      for (t <- 1 to 2 if vals(t).nonEmpty && vals(t + 1).nonEmpty)
        assert(vals(t).max <= vals(t + 1).min, s"tercile $t overlaps ${t + 1}")
    }
    assert(out.forall { r =>
      r._5 == (r._4 match { case 1 => "head"; case 2 => "middle"; case _ => "tail" })
    })
    // composition: the perplexity column IS q_unigram_logprob's
    val lm = TextOps.qUnigramLogprob.fn(spark, sf)
      .select("doc_id", "perplexity").as[(Long, Double)].collect().toMap
    out.foreach { case (id, _, p, _, _) => assert(lm(id) == p, s"doc $id ppl drift") }
  }

  test("quality classifier matches a naive Naive-Bayes reimplementation") {
    val out = Selection.qQualityClassifier.fn(spark, sf)
      .select("doc_id", "n_tokens", "logit")
      .as[(Long, Int, Double)].collect()
    assert(out.nonEmpty)
    // scores exactly the held-out split, finite everywhere
    assert(out.forall(_._1 % 5 == 0))
    assert(out.forall(r => !r._3.isNaN && !r._3.isInfinite),
      "Laplace smoothing must keep every logit finite")
    // independent witness: the whole model recomputed with plain Scala maps
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    // engine-faithful tokenizer (ADVICE r5): NULL-safe, and pins the
    // no-exotic-whitespace assumption — the engine trims spaces only,
    // Java's String.trim strips every char <= U+0020
    def toks(t: String): Seq[String] = {
      if (t == null) return Nil
      val st = t.replaceAll("^ +| +$", "")
      assert(st == st.trim,
        "witness assumes no exotic-whitespace-bordered text")
      st.toLowerCase.split("\\s+").toSeq
    }
    val curated = Set("src0", "src1", "src2", "src3")
    val train = docs.filter(_._1 % 5 != 0)
    val cp = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val cn = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    train.foreach { case (_, src, tx) =>
      val m = if (curated(src)) cp else cn
      toks(tx).foreach(w => m(w) += 1)
    }
    val vocab = cp.keySet ++ cn.keySet
    val (tp, tn, v) = (cp.values.sum.toDouble, cn.values.sum.toDouble,
      vocab.size.toDouble)
    val dp = train.count(d => curated(d._2)).toDouble
    val dn = train.length - dp
    val got = out.map(r => r._1 -> (r._2, r._3)).toMap
    val test = docs.filter(_._1 % 5 == 0)
    assert(got.size == test.length, "one row per held-out doc")
    test.foreach { case (id, _, tx) =>
      val ts = toks(tx)
      val want = math.log(dp / dn) +
        ts.map(w => math.log(cp(w) + 1.0) - math.log(cn(w) + 1.0)).sum +
        ts.size * math.log((tn + v) / (tp + v))
      val (n, logit) = got(id)
      assert(n == ts.size, s"doc $id token count $n vs ${ts.size}")
      assert(math.abs(logit - want) < 0.011, s"doc $id logit $logit vs $want")
    }
  }

  test("quality classifier is deterministic") {
    val a = Selection.qQualityClassifier.fn(spark, sf).collect()
    val b = Selection.qQualityClassifier.fn(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("q_weighted_sample: exactly the top-200 Efraimidis-Spirakis keys, JDK-md5 witness") {
    val out = Selection.qWeightedSample.fn(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0)
    // independent witness: JDK MessageDigest, not Spark's md5
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): Long = {
      val hex = md.digest(s"ws:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    def key(u48: Long, w: Long): Double =
      math.log((u48 + 1).toDouble / 281474976710656.0) / w
    val want = docs.map { case (id, w) => (id, w, draw(id)) }
      .sortBy { case (id, w, u) => (-key(u, w), id) }
      .take(math.min(200, docs.length))
    assert(out.length == want.length)
    out.zip(want).foreach { case (got, (id, w, u)) =>
      // integer-exact output row (no transcendental reaches the bytes)
      assert(got.getLong(0) == id && got.getLong(1) == w &&
        got.getLong(2) == u, s"sample row $got expected ($id, $w, $u)")
    }
    // weighting bias: the ES key favors heavy docs, so the sampled mean
    // weight must exceed the corpus mean weight
    val sampleMean = out.map(_.getLong(1)).sum.toDouble / out.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("q_weighted_sample is deterministic across runs") {
    val a = Selection.qWeightedSample.fn(spark, sf).collect()
    val b = Selection.qWeightedSample.fn(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("q_length_outliers matches a naive driver-side median/MAD witness") {
    val out = Selection.qLengthOutliers.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.size == docs.length, "every document gets a flag")
    // lower median over (value, doc_id) order — the engine's contract
    docs.groupBy(_._2).foreach { case (lang, rows) =>
      val med = rows.map(r => (r._3, r._1)).sorted
        .apply((rows.size + 1) / 2 - 1)._1
      val mad = rows.map(r => (math.abs(r._3 - med), r._1)).sorted
        .apply((rows.size + 1) / 2 - 1)._1
      rows.foreach { case (id, _, x) =>
        val (l2, x2, m2, d2, flag) = out(id)
        assert(l2 == lang && x2 == x)
        assert(m2 == med, s"lang $lang median $m2 vs $med")
        assert(d2 == mad, s"lang $lang MAD $d2 vs $mad")
        assert(flag == (math.abs(x - med) > 3 * mad), s"doc $id flag")
      }
    }
    // the synthetic lengths are tight (no 3-MAD outliers at this SF) —
    // the flag branch itself is pinned row-wise against the witness above
    // and cross-engine by the DuckDB oracle
    assert(out.values.exists(!_._5))
  }
}
