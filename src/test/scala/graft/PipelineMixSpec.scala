package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

/** Invariants of the corpus-mixing operators (q_domain_mixture,
  * q_sequence_pack) beyond the oracle hash: determinism under
  * repartitioning, exact rate semantics, and chunk-geometry laws the SQL
  * twin can't state directly. */
class PipelineMixSpec extends SparkSpec {
  import spark.implicits._

  test("domain mixture keeps every doc of a rate-1.0 source and is " +
    "deterministic under repartitioning") {
    val docs = Tables.documents(spark, sf)
    val kept = Pipeline.qDomainMixture.fn(spark, sf).cache()
    try {
      val full = docs.filter(col("source").isin((0 to 4).map(i => s"src$i"): _*))
      assert(kept.filter(col("source").isin((0 to 4).map(i => s"src$i"): _*))
        .count() == full.count(), "rate-1.0 sources must keep every doc")

      // the keep set is a pure function of doc_id — recompute membership
      // with the same hash in the test and demand exact equality
      val expect = docs
        .select(col("doc_id"), col("source"),
          substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
            .as("bucket"))
        .filter(
          col("source").isin((0 to 4).map(i => s"src$i"): _*) ||
            (col("source").isin((5 to 9).map(i => s"src$i"): _*) &&
              col("bucket") < "80") ||
            (col("source").isin((10 to 19).map(i => s"src$i"): _*) &&
              col("bucket") < "40"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == expect)

      // repartitioning the input must not change membership (hash is
      // row-local, not partition-local)
      val reshuffled = Pipeline.qDomainMixture
        .fn(spark, sf).repartition(17)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(reshuffled == expect)
    } finally kept.unpersist()
  }

  test("sequence packing tiles each source's token stream exactly") {
    val out = Pipeline.qSequencePack.fn(spark, sf).cache()
    try {
      // chunk geometry per source: doc ranges are contiguous, start at
      // chunk 0, and the last chunk index is ceil(total_tokens/256)-1
      val bySource = out.collect().groupBy(_.getString(1))
      bySource.foreach { case (src, rows) =>
        val sorted = rows.sortBy(_.getLong(0))
        var cum = 0L
        sorted.foreach { r =>
          val n = r.getInt(2).toLong
          assert(r.getLong(3) == cum / 256, s"$src doc ${r.getLong(0)} first_chunk")
          assert(r.getLong(4) == (cum + n - 1) / 256, s"$src last_chunk")
          assert(r.getLong(5) == r.getLong(4) - r.getLong(3) + 1)
          cum += n
        }
        val lastChunk = sorted.map(_.getLong(4)).max
        assert(lastChunk == (cum - 1) / 256,
          s"$src: stream of $cum tokens must end in chunk ceil/256 - 1")
      }
      // a doc never spans more chunks than its token count requires
      assert(out.filter(col("n_chunks") > col("n_tokens") / 256 + 2)
        .count() == 0)
    } finally out.unpersist()
  }

  test("token budget keeps each source's least-repetitive prefix") {
    val kept = Pipeline.qTokenBudget.fn(spark, sf).collect()
      .groupBy(_.getString(1))
    val full = graft.operators.TextOps.qRepetitionProfile.fn(spark, sf)
      .select("doc_id", "dup_token_ratio").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sources = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet)
    sources.foreach { case (src, ids) =>
      val k = kept.getOrElse(src, Array.empty)
      assert(k.nonEmpty, s"$src: the first doc is always within budget")
      // the kept set is the PREFIX of the (dup_ratio, doc_id) ranking:
      // every kept doc ranks before every dropped doc
      val keptIds = k.map(_.getLong(0)).toSet
      val rank = (id: Long) => (full(id), id)
      val dropped = ids -- keptIds
      if (dropped.nonEmpty && keptIds.nonEmpty) {
        val worstKept = keptIds.map(rank).max
        val bestDropped = dropped.map(rank).min
        assert(Ordering[(Double, Long)].lt(worstKept, bestDropped),
          s"$src: kept set is not a ranking prefix")
      }
      // take-until-exceed: tokens accumulated BEFORE each kept doc < 500,
      // and the doc ranked right after the prefix would start >= 500
      val prefixTokens = k.map(_.getInt(2).toLong).sum
      val lastDocTokens = k.maxBy(r => rank(r.getLong(0))).getInt(2)
      assert(prefixTokens - lastDocTokens < 500,
        s"$src: a kept doc started at or past the budget")
      if (dropped.nonEmpty)
        assert(prefixTokens >= 500,
          s"$src: dropped docs but the budget was never reached")
    }
  }

  test("group split never lets a near-dup group straddle splits") {
    val out = Pipeline.qGroupSplit.fn(spark, sf).cache()
    try {
      // the leakage invariant: every group maps to exactly one split
      assert(out.groupBy("group_id")
        .agg(countDistinct("split").as("n"))
        .filter(col("n") > 1).count() == 0)
      // covers every document exactly once
      assert(out.count() == Tables.documents(spark, sf).count())
      assert(out.select("doc_id").distinct().count() == out.count())
      // all three splits materialize and agree with the group-key hash
      val splits = out.select("split").distinct()
        .collect().map(_.getString(0)).toSet
      assert(splits == Set("train", "val", "test"))
      val byHash = out
        .withColumn("b",
          substring(md5(col("group_id").cast("string").cast("binary")), 1, 1))
        .filter((col("b") <= "b" && col("split") =!= "train") ||
          (col("b") > "b" && col("b") <= "d" && col("split") =!= "val") ||
          (col("b") > "d" && col("split") =!= "test"))
      assert(byHash.count() == 0)
    } finally out.unpersist()
  }

  test("epoch shuffle is a sharded permutation keyed by the salted md5") {
    val out = Pipeline.qEpochShuffle.fn(spark, sf)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    val ids = Tables.documents(spark, sf).select("doc_id")
      .as[Long].collect().toSet
    // a permutation: every document exactly once
    assert(out.map(_._1).toSet == ids && out.length == ids.size)
    // per-shard positions are contiguous 1..n — a loader can stream each
    // shard by position with no gaps
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    // shard and order both derive from md5("epoch7:" + doc_id) — witness
    // with the JDK digest, independent of both engines
    def h(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"epoch7:$id".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    out.foreach { case (id, shard, _) =>
      assert(shard == Integer.parseInt(h(id).substring(0, 1), 16) % 8,
        s"doc $id shard")
    }
    out.groupBy(_._2).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._3).map(_._1)
      val byKey = rows.map(_._1).sortBy(id => (h(id), id))
      assert(byPos.sameElements(byKey), "within-shard order must follow the key")
    }
    // reproducible: same salt, same order, any run
    val again = Pipeline.qEpochShuffle.fn(spark, sf)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.sameElements(again))
  }

  test("curriculum order: unique positions, per-source ramp, round-robin residue") {
    val out = Pipeline.qCurriculumOrder.fn(spark, sf)
      .select("doc_id", "source", "n_words", "position")
      .as[(Long, String, Long, Long)].collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.length == total)
    // positions are unique (the interleave formula cannot collide)
    assert(out.map(_._4).distinct.length == out.length)
    val sources = out.map(_._2).distinct.sorted
    val ns = sources.length.toLong
    val sidx = sources.zipWithIndex.toMap
    out.groupBy(_._2).foreach { case (src, rows) =>
      // round-robin law: a source's positions all share its residue class
      assert(rows.forall(r => r._4 % ns == sidx(src)),
        s"source $src leaked out of its residue class")
      // curriculum law: difficulty (word count) never decreases along
      // the source's own schedule
      val ramp = rows.sortBy(_._4).map(_._3)
      assert(ramp.zip(ramp.drop(1)).forall { case (a, b) => a <= b },
        s"source $src difficulty ramp not monotone")
    }
  }
}
