package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Corpus-analysis operators (round 6, second pack): canonical-
  * representative selection for near-dup groups, PMI bigram collocations,
  * and two-pass heavy-hitter detection over a mergeable Misra-Gries
  * sketch.
  *
  * Reference scope: extends the reference lakehouse's analytics surface
  * (dwdas9/minio-iceberg-polaris-lakehouse, workspace/notebooks/) with
  * the vocabulary-analysis and dedup-resolution recipes a training-data
  * pipeline needs; the sketch follows Misra & Gries 1982 with the
  * mergeability result of Agarwal et al. 2012 (mergeable summaries).
  */
object CorpusOps {

  /** Tokens of a document, lowercased, empty strings removed — the
    * corpus-wide tokenizer every TextOps oracle pins. */
  private def toks = filter(TextOps.tokens(lower(col("text"))), _ =!= lit(""))

  /** Canonical-representative selection: after near-dup grouping
    * (Pipeline.dedupGroupsFrame — the same labels q_dedup_groups pins),
    * each group keeps its LONGEST member (token count, doc_id tiebreak)
    * as the canonical copy — the "which duplicate survives" decision of a
    * dedup pipeline, preferring the most complete variant over the
    * arbitrary first-seen one.
    *
    * Scale design (100 TB): the group labels are the already-linear
    * component computation; the selection adds one window over groups
    * (partition = group_id, groups are duplication-bounded — thousands of
    * members at worst, never corpus-sized) with an explicit
    * unbounded-unbounded frame so every member reads the winner without a
    * second self-join pass. */
  val qDedupCanonical: Q = Q(
    "q_dedup_canonical",
    """WITH RECURSIVE
       sh AS (
         SELECT DISTINCT doc_id, shingle FROM (
           SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM (SELECT doc_id,
                        regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                 FROM documents))),
       sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS i
                 FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
                 GROUP BY 1, 2),
       pairs AS (SELECT id_a, id_b FROM inter
                 JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
                 WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
       edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION ALL SELECT id_b, id_a FROM pairs),
       reach(id, root) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
       g AS (SELECT id AS doc_id, min(root) AS group_id FROM reach GROUP BY id),
       c AS (SELECT doc_id,
                    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                        x -> x <> '')) AS ntok
             FROM documents),
       w AS (SELECT g.doc_id, g.group_id,
                    first_value(g.doc_id) OVER (PARTITION BY g.group_id
                       ORDER BY c.ntok DESC, g.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS canonical_id
             FROM g JOIN c ON g.doc_id = c.doc_id)
       SELECT doc_id, group_id, canonical_id,
              doc_id = canonical_id AS is_canonical
       FROM w ORDER BY doc_id""") { (s, d) =>
    val groups = Pipeline.dedupGroupsFrame(s, d)
    val ntok = Tables.documents(s, d)
      .select(col("doc_id"), size(toks).as("ntok"))
    val w = Window.partitionBy("group_id")
      .orderBy(col("ntok").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    groups.join(ntok, "doc_id")
      .select(col("doc_id"), col("group_id"),
        first(col("doc_id")).over(w).as("canonical_id"))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .orderBy("doc_id")
  }

  /** PMI bigram collocations — the phrase-detection pass of vocabulary /
    * tokenizer construction: pointwise mutual information
    * ln(p(ab) / (p(a)·p(b))) over adjacent word pairs, count floor 5,
    * top-50. A high-PMI pair ("new york") is a merge candidate; a flat
    * corpus scores ≈ 0 everywhere.
    *
    * Determinism: all counts are exact longs; the PMI ratio is built
    * with one fixed parenthesization of IEEE basic ops over doubles cast
    * from those longs, and ln parity between the JVM and DuckDB is the
    * same already-pinned assumption the BM25 / unigram-LM oracles carry.
    * Ranking happens at the rounded 4-dp granularity with the bigram as
    * tiebreak, so order is stable cross-engine.
    *
    * Scale design (100 TB): two map-side-combined aggregations (bigram
    * and unigram vocab), one corpus scan each — the bigram explode is
    * the same shape as q_word_freq, with per-partition partial
    * aggregation collapsing to vocabulary size before the exchange. The
    * unigram side joins in as a vocab-sized broadcast (the unigram-LM
    * assumption); totals are single-row broadcasts. Top-50 is
    * TakeOrdered, never a global sort. */
  val qPmiBigrams: Q = Q(
    "q_pmi_bigrams",
    """WITH t AS (SELECT list_filter(
                           regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '') AS toks
                  FROM documents),
       u AS (SELECT unnest(toks) AS w FROM t),
       uc AS (SELECT w, count(*) AS cw FROM u GROUP BY w),
       n1 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u),
       bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS b
              FROM t),
       bc AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
       n2 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bg)
       SELECT bc.b AS bigram, CAST(bc.cb AS BIGINT) AS n_pair,
              round(ln(((CAST(bc.cb AS DOUBLE) * n1.n) * n1.n)
                       / ((n2.n * CAST(ca.cw AS DOUBLE))
                          * CAST(cb2.cw AS DOUBLE))), 4) AS pmi
       FROM bc CROSS JOIN n1 CROSS JOIN n2
       JOIN uc ca ON ca.w = split_part(bc.b, ' ', 1)
       JOIN uc cb2 ON cb2.w = split_part(bc.b, ' ', 2)
       WHERE bc.cb >= 5
       ORDER BY pmi DESC, bigram LIMIT 50""") { (s, d) =>
    val base = Tables.documents(s, d).select(toks.as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("cw"))
    val n1 = uni.agg(count(lit(1)).cast("double").as("n1"))
    val bg = base.filter(size(col("toks")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("b"))
    val bc = bg.groupBy("b").agg(count(lit(1)).as("cb"))
    val n2 = bg.agg(count(lit(1)).cast("double").as("n2"))
    bc.filter(col("cb") >= 5)
      .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
      .join(broadcast(uc.select(col("w").as("wa"), col("cw").as("ca"))),
        split_part(col("b"), lit(" "), lit(1)) === col("wa"))
      .join(broadcast(uc.select(col("w").as("wb"), col("cw").as("cb2"))),
        split_part(col("b"), lit(" "), lit(2)) === col("wb"))
      .select(col("b").as("bigram"), col("cb").as("n_pair"),
        round(log(
          (col("cb").cast("double") * col("n1") * col("n1")) /
            (col("n2") * col("ca").cast("double") * col("cb2").cast("double"))
        ), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(50)
  }

  /** Heavy-hitter tokens, two-pass: a mergeable Misra-Gries sketch
    * (k = 128 counters) finds the candidate set in ONE map-side-combined
    * pass, then an exact recount of just those ≤ k candidates keeps the
    * tokens above the 1% frequency threshold. The MG guarantee — any
    * token with true count > N/(k+1) survives the sketch — makes the
    * candidate set a superset of every ≥ N/129 token, so with the 1%
    * (= N/100 > N/129) cut the composed result is EXACT and oracled,
    * not approximate: the sketch only bounds the work, never the answer.
    *
    * Scale design (100 TB): pass 1 reduces each partition to one ≤ k-entry
    * summary (merge is associative/commutative — Agarwal et al. 2012), so
    * the exchange carries partitions×k entries no matter how large the
    * vocabulary; pass 2 aggregates only candidate tokens (broadcast ≤ 128
    * strings), never the full vocab. Compare q_word_freq, which shuffles
    * the whole vocabulary: same answer shape, unbounded exchange. The
    * threshold compare is pure integer (100·n > N) — no float anywhere. */
  val qHeavyHitters: Q = Q(
    "q_heavy_hitters",
    """WITH u AS (SELECT unnest(list_filter(
                           regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '')) AS w
                  FROM documents),
       n AS (SELECT count(*) AS total FROM u),
       c AS (SELECT w, count(*) AS n_tok FROM u GROUP BY w)
       SELECT w AS token, CAST(n_tok AS BIGINT) AS n_tok
       FROM c CROSS JOIN n
       WHERE 100 * n_tok > total
       ORDER BY n_tok DESC, token""") { (s, d) =>
    val uni = Tables.documents(s, d)
      .select(explode(toks).as("w"))
    // pass 1: sketch + total in one corpus scan; the collected summary is
    // ≤ k entries — bounded by design, never corpus-sized
    val mg = udaf(new MisraGries(128), Encoders.STRING)
    val row = uni.agg(mg(col("w")).as("sk"), count(lit(1)).as("total"))
      .select(col("sk.keys").as("keys"), col("total")).head()
    val candidates = row.getSeq[String](0)
    val total = row.getLong(1)
    // pass 2: exact recount of candidates only, integer threshold
    uni.filter(col("w").isin(candidates: _*))
      .groupBy("w").agg(count(lit(1)).as("n_tok"))
      .filter(lit(100L) * col("n_tok") > lit(total))
      .select(col("w").as("token"), col("n_tok"))
      .orderBy(col("n_tok").desc, col("token"))
  }

  /** Zipf power-law fit of the corpus token-frequency distribution: OLS of
    * ln(frequency) on ln(rank) over the full vocabulary — slope ≈ −1 is
    * the healthy-natural-text signature; a flat slope marks templated /
    * machine-generated corpora and a cliff marks boilerplate floods. The
    * single-row (vocab, slope, intercept) output is the corpus-health
    * gauge a curation pipeline tracks across ingest batches.
    *
    * Determinism: rank is a total order (count desc, token asc); x = ln
    * rank and y = ln count are single IEEE expressions over exact
    * integers, and all four regression sums are ExactSum-quantized
    * integer sums — order-independent and bit-identical across engines.
    * The closed-form slope/intercept then divide identical doubles.
    *
    * Scale design (100 TB): everything after the map-side-combining token
    * count is VOCABULARY-sized (Heaps' law: ≪ corpus). The rank window is
    * a single vocab-sized sort — the deliberate exact test-scale choice;
    * at extreme vocabularies the production twin ranks only the
    * q_heavy_hitters top-K and fits the head, which is where the Zipf
    * diagnostic lives anyway. */
  val qZipfFit: Q = Q(
    "q_zipf_fit",
    """WITH u AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                  FROM documents),
       f AS (SELECT tok, count(*) AS c FROM u WHERE tok <> '' GROUP BY tok),
       r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM f),
       t AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM r),
       s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                    CAST(sum(CAST(floor(x * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sx,
                    CAST(sum(CAST(floor(y * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sy,
                    CAST(sum(CAST(floor(x * y * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sxy,
                    CAST(sum(CAST(floor(x * x * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sxx
             FROM t)
       SELECT CAST(n AS INTEGER) AS vocab,
              CASE WHEN n >= 2
                   THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
                   END AS slope,
              CASE WHEN n >= 2
                   THEN round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 4)
                   END AS intercept
       FROM s""") { (s, d) =>
    val f = Tables.documents(s, d)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val rk = row_number().over(Window.orderBy(col("c").desc, col("tok")))
    val t = f.select(col("c"), rk.as("rk"))
      .select(log(col("rk").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    val su = t.agg(
      count(lit(1)).cast("double").as("n"),
      ExactSum.qsum(col("x")).as("qx"), ExactSum.qsum(col("y")).as("qy"),
      ExactSum.qsum(col("x") * col("y")).as("qxy"),
      ExactSum.qsum(col("x") * col("x")).as("qxx"))
      .select(col("n"), ExactSum.value(col("qx")).as("sx"),
        ExactSum.value(col("qy")).as("sy"),
        ExactSum.value(col("qxy")).as("sxy"),
        ExactSum.value(col("qxx")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    // degenerate single-token vocabulary: n·sxx − sx² = 0 and the engines
    // disagree on 0/0 (Spark Divide → NULL, DuckDB ieee ops → NaN) —
    // nullify the fit identically on both sides (ADVICE r6)
    su.select(col("n").cast("int").as("vocab"),
      when(col("n") >= 2, round(slope, 4)).as("slope"),
      when(col("n") >= 2,
        round((col("sy") - slope * col("sx")) / col("n"), 4)).as("intercept"))
  }

  /** Per-source duplication report — the dedup ACCOUNTING view a curation
    * dashboard tracks per ingest batch: document count, distinct
    * normalized texts, duplicate count/rate and the largest duplicate
    * class, per source. Uses exactly q_dedup_fingerprint's normalization
    * (md5 of the whitespace-collapsed lowercase text) so the numbers
    * reconcile with the dedup operators; GROUP BY treats the NULL-text
    * fingerprint as one class on both engines.
    *
    * Scale design (100 TB): one map-side-combining aggregate to the
    * (source, fingerprint) classes, one source-sized rollup — the whole
    * report is two hash aggregates, no joins, no windows. */
  val qDupRateReport: Q = Q(
    "q_dup_rate_report",
    """WITH f AS (SELECT source,
                         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
                  FROM documents),
       g AS (SELECT source, fp, count(*) AS k FROM f GROUP BY 1, 2)
       SELECT source,
              CAST(sum(k) AS BIGINT) AS docs,
              CAST(count(*) AS BIGINT) AS distinct_texts,
              CAST(sum(k) - count(*) AS BIGINT) AS dup_docs,
              CAST((20000 * (sum(k) - count(*)) + sum(k)) // (2 * sum(k))
                   AS DOUBLE) / 10000 AS dup_rate,
              CAST(max(k) AS BIGINT) AS max_class
       FROM g GROUP BY source ORDER BY source""") { (s, d) =>
    val fp = md5(regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    Tables.documents(s, d)
      .select(col("source"), fp.as("fp"))
      .groupBy("source", "fp").agg(count(lit(1)).as("k"))
      .groupBy("source")
      .agg(sum("k").as("docs"),
        count(lit(1)).as("distinct_texts"),
        (sum("k") - count(lit(1))).as("dup_docs"),
        ExactSum.intRatio(sum("k") - count(lit(1)), sum("k"), 4)
          .as("dup_rate"),
        max("k").as("max_class"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(qDedupCanonical, qPmiBigrams, qHeavyHitters, qZipfFit,
    qDupRateReport)
}

/** Misra-Gries frequent-items sketch as a Spark `Aggregator`, usable via
  * `functions.udaf` in untyped aggregations. The buffer is the classic
  * ≤ k counter map; `merge` implements the Agarwal et al. 2012 mergeable
  * form (add counts, then subtract the (k+1)-th largest and drop ≤ 0),
  * so partial aggregates combine associatively in ANY order while
  * preserving the deficit bound: for every token,
  * true − N/(k+1) ≤ est ≤ true, and any token with true > N/(k+1) is
  * present in the summary (CorpusOpsSpec pins all three laws on skewed
  * synthetic streams under multiple partitionings).
  *
  * Cost: O(1) amortized per hit; a miss against a full buffer decrements
  * all k entries (the classic form — k is small and fixed, and the decay
  * path only runs while the stream keeps producing novel tokens). The
  * buffer rides Spark's ObjectHashAggregate, so it stays a live JVM map
  * between rows and serializes (kryo) only at partial-output boundaries. */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], MgSummary] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < k => b.updated(w, 1L)
      // full buffer, novel token: +1 to w then −1 to all (w drops at 0)
      case None => b.flatMap { case (t, c) =>
        if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val m = y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0:
      // ≤ k entries survive and every surviving deficit grows by ≤ thr,
      // which telescopes to the N/(k+1) bound across any merge tree
      val thr = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.flatMap { case (t, c) => if (c > thr) Some(t -> (c - thr)) else None }
    }
  }

  override def finish(r: Map[String, Long]): MgSummary = {
    val sorted = r.toArray.sortBy { case (t, c) => (-c, t) }
    MgSummary(sorted.map(_._1), sorted.map(_._2))
  }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
}

/** Sketch output: parallel arrays sorted by (count desc, token). */
final case class MgSummary(keys: Array[String], counts: Array[Long])
