package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, MisraGries, Pipeline}

/** Law pins for the corpus-analysis pack (CorpusOps.scala). The DuckDB
  * oracles pin cross-engine value equality; these pin the semantics the
  * oracles can't express — the Misra-Gries deficit guarantee under
  * arbitrary partitionings (including forced evictions, which the
  * near-uniform fixtures never trigger at k = 128), canonical-selection
  * laws against the group structure, and a naive PMI witness.
  */
class CorpusOpsSpec extends SparkSpec {

  private def tokensOf(t: String): Seq[String] =
    if (t == null) Nil
    else t.replaceAll("^ +| +$", "").toLowerCase.split("\\s+").toSeq
      .filter(_.nonEmpty)

  // ---- canonical selection ----

  test("q_dedup_canonical: one canonical per group, the longest member wins") {
    val out = CorpusOps.qDedupCanonical.fn(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tokensOf(r.getString(1)).length)
      .toMap
    assert(out.length == docs.size, "every document must be labeled")
    val byGroup = out.groupBy(_.getLong(1))
    byGroup.foreach { case (gid, members) =>
      val canon = members.filter(_.getBoolean(3))
      assert(canon.length == 1, s"group $gid has ${canon.length} canonicals")
      val cid = canon.head.getLong(0)
      assert(members.forall(_.getLong(2) == cid),
        s"group $gid members disagree on canonical_id")
      // the canonical maximizes (ntok, -doc_id) over the group
      val best = members.map(_.getLong(0)).minBy(id => (-docs(id), id))
      assert(cid == best,
        s"group $gid canonical $cid is not the longest member $best")
    }
    // group labels are exactly the pinned q_dedup_groups labels
    val groups = Pipeline.qDedupGroups.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == groups(r.getLong(0)),
        s"doc ${r.getLong(0)} group label diverges from q_dedup_groups")
    }
  }

  // ---- PMI bigrams ----

  test("q_pmi_bigrams matches a naive driver-side PMI computation") {
    val out = CorpusOps.qPmiBigrams.fn(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 50)
    val toks = Tables.documents(spark, sf).select("text").collect()
      .map(r => tokensOf(r.getString(0)))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n1 = toks.map(_.length).sum.toDouble
    val bi = toks.flatMap(t => t.zip(t.drop(1)).map { case (a, b) => s"$a $b" })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n2 = toks.map(t => math.max(t.length - 1, 0)).sum.toDouble
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = bi.toSeq.collect { case (b, c) if c >= 5 =>
      val Array(a, z) = b.split(" ", 2)
      (b, c, r4(math.log((c.toDouble * n1 * n1) / (n2 * uni(a) * uni(z)))))
    }.sortBy { case (b, _, p) => (-p, b) }.take(50)
    assert(out.length == want.length)
    out.zip(want).foreach { case (got, (b, c, p)) =>
      assert(got.getString(0) == b && got.getLong(1) == c,
        s"row mismatch: $got vs ($b,$c,$p)")
      assert(math.abs(got.getDouble(2) - p) < 5e-4,
        s"pmi mismatch for $b: ${got.getDouble(2)} vs $p")
    }
  }

  // ---- Misra-Gries sketch laws ----

  /** Skewed synthetic stream with known exact counts: token i of m
    * appears 2^(m-i) times — heavy head, long-ish tail. */
  private def skewedStream(m: Int): Seq[String] =
    (1 to m).flatMap(i => Seq.fill(1 << (m - i))(s"t$i"))

  private def sketchOf(stream: Seq[String], k: Int, parts: Int) = {
    import spark.implicits._
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    spark.createDataset(stream).repartition(parts)
      .toDF("w").agg(mg(col("w")).as("sk"))
      .select(col("sk.keys"), col("sk.counts"))
      .head() match {
      case Row(keys: scala.collection.Seq[_], counts: scala.collection.Seq[_]) =>
        keys.map(_.asInstanceOf[String])
          .zip(counts.map(_.asInstanceOf[Long])).toMap
    }
  }

  test("MisraGries: deficit bound and heavy-superset hold under any partitioning") {
    val stream = skewedStream(10) // 1023 tokens, counts 512..1
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.length.toLong
    for (k <- Seq(4, 8); parts <- Seq(1, 3, 7, 16)) {
      val est = sketchOf(stream, k, parts)
      assert(est.size <= k, s"k=$k parts=$parts: ${est.size} entries")
      // est <= true and true - est <= N/(k+1), for every reported token
      est.foreach { case (t, e) =>
        assert(e >= 1 && e <= truth(t),
          s"k=$k parts=$parts: overestimate for $t: $e > ${truth(t)}")
        assert(truth(t) - e <= n / (k + 1),
          s"k=$k parts=$parts: deficit ${truth(t) - e} > N/(k+1)=${n / (k + 1)}")
      }
      // every token with true count > N/(k+1) must be present
      truth.foreach { case (t, c) =>
        if (c > n / (k + 1))
          assert(est.contains(t),
            s"k=$k parts=$parts: heavy token $t (count $c) missing")
      }
    }
  }

  test("MisraGries: eviction path is exercised and exact when vocab <= k") {
    // vocab 10 > k=4 forces evictions above; vocab <= k must be EXACT
    val stream = skewedStream(5) // vocab 5, counts 16..1
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = sketchOf(stream, 8, 4)
    assert(est == truth, s"no-eviction sketch must be exact: $est vs $truth")
  }

  // ---- two-pass heavy hitters ----

  test("q_heavy_hitters equals the exact >1% token set") {
    val out = CorpusOps.qHeavyHitters.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => tokensOf(r.getString(0)))
    val truth = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = toks.length.toLong
    val want = truth.toSeq.filter { case (_, c) => 100L * c > n }
      .sortBy { case (t, c) => (-c, t) }
    assert(out.toSeq == want,
      s"two-pass result diverges from exact heavy hitters")
  }

  test("q_zipf_fit matches a naive driver-side OLS witness") {
    val Array(row) = CorpusOps.qZipfFit.fn(spark, sf).collect()
    val toks = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => tokensOf(r.getString(0)))
    val freq = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val pts = freq.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(row.getInt(0) == pts.length)
    assert(math.abs(row.getDouble(1) - slope) < 5e-4,
      s"slope ${row.getDouble(1)} vs $slope")
    assert(math.abs(row.getDouble(2) - icept) < 5e-4,
      s"intercept ${row.getDouble(2)} vs $icept")
    // on any real token distribution the fit is decreasing
    assert(row.getDouble(1) < 0.0)
  }
}
