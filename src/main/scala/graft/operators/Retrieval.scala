package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Vectors.{dot, norm, toDouble}

/** Hybrid retrieval and corpus-mixing operators (round 6): the fusion /
  * mixing layer a training-data pipeline runs ON TOP of the retrieval and
  * dedup primitives — reciprocal-rank fusion of sparse (BM25) and dense
  * (embedding-cosine) retrieval, temperature-scaled language resampling,
  * per-source contribution caps, and the token-length histogram report.
  *
  * Reference scope: the reference lakehouse (dwdas9/minio-iceberg-polaris-
  * lakehouse) demonstrates SQL analytics over lake tables
  * (workspace/notebooks/, warehouse_helpers.py); these operators extend
  * that surface with the standard data-curation recipes (RRF as in
  * Cormack et al. 2009; temperature mixing as in multilingual pretraining
  * practice) expressed Spark-first.
  *
  * Cross-engine determinism notes (the r5→r6 lesson, see ExactSum):
  * every aggregate here is an integer sum, every score that feeds a
  * rank is either already-rounded upstream or a pure IEEE-basic-op
  * expression (+ - * / sqrt floor least) that both engines are REQUIRED
  * to evaluate to the identical double — no libm beyond what the pinned
  * BM25 oracle already uses, no decimal rounding of fresh float sums.
  */
object Retrieval {

  private val FusionTerms = Seq("vector", "join", "stream")
  private val DenseQueryId = 0L
  private val CandidateDepth = 100
  private val RrfK = 60

  /** RRF contribution as an exact integer: floor(1e12 / (60 + rank)).
    * The quotient's fractional part is k/(60+r) ≥ 1/160, at least 10^3
    * ulps from an integer, so floor is unambiguous; summing longs is
    * order-independent and engine-exact — no decimal rounding anywhere
    * in the fused score. NULL rank (candidate found by one branch only)
    * contributes 0. */
  private def rrfTerm(rank: Column): Column =
    coalesce(floor(lit(1.0e12) / (lit(RrfK) + rank)), lit(0L))

  /** Rank the top `CandidateDepth` rows of a scored frame: TakeOrdered
    * (orderBy+limit — never a global sort at scale) down to a bounded
    * candidate list, THEN a row_number window over just those ≤100 rows.
    * The single-partition window is safe by construction: its input is
    * capped at CandidateDepth regardless of corpus size. */
  private def rankTop(df: DataFrame, score: Column, id: Column,
      rankName: String): DataFrame =
    df.orderBy(score.desc, id)
      .limit(CandidateDepth)
      .withColumn(rankName,
        row_number().over(Window.orderBy(score.desc, id)))

  /** Hybrid search (sparse + dense, reciprocal-rank fusion): BM25 top-100
    * for the query terms over `documents`, cosine top-100 against a fixed
    * query embedding over `embeddings` (doc_id = vec_id), fused with
    * RRF(k=60) — the standard two-tower retrieval front-end for targeted
    * corpus construction ("find documents about X" where either lexical
    * or semantic evidence suffices).
    *
    * Scale design (100 TB): each branch is the already-pinned linear
    * shape — BM25 is one map-only corpus pass + broadcast stats
    * (TextOps.bm25Scores), dense is a broadcast single query vector
    * against a streamed corpus (at production scale the IVF/LSH variants
    * swap in for the exact scan; the fusion is branch-agnostic). The
    * fusion itself joins two ≤100-row frames — driver-trivial forever.
    * Ranks are ints, fused scores are exact long sums (rrfTerm). */
  val qHybridSearch: Q = Q(
    "q_hybrid_search",
    s"""WITH t AS (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
                  FROM documents),
       base AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dlen,
                       CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS f_vector,
                       CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS f_join,
                       CAST(len(list_filter(toks, x -> x = 'stream')) AS DOUBLE) AS f_stream
                FROM t),
       st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dlen) AS ad,
                     sum(CASE WHEN f_vector > 0 THEN 1.0 ELSE 0.0 END) AS df_vector,
                     sum(CASE WHEN f_join > 0 THEN 1.0 ELSE 0.0 END) AS df_join,
                     sum(CASE WHEN f_stream > 0 THEN 1.0 ELSE 0.0 END) AS df_stream
              FROM base),
       sc AS (SELECT b.doc_id,
                     (CASE WHEN b.f_vector > 0 THEN
                        ln((st.n - st.df_vector + 0.5) / (st.df_vector + 0.5) + 1)
                        * b.f_vector * 2.2
                        / (b.f_vector + 1.2 * (0.25 + 0.75 * b.dlen / st.ad))
                      ELSE 0 END
                    + CASE WHEN b.f_join > 0 THEN
                        ln((st.n - st.df_join + 0.5) / (st.df_join + 0.5) + 1)
                        * b.f_join * 2.2
                        / (b.f_join + 1.2 * (0.25 + 0.75 * b.dlen / st.ad))
                      ELSE 0 END
                    + CASE WHEN b.f_stream > 0 THEN
                        ln((st.n - st.df_stream + 0.5) / (st.df_stream + 0.5) + 1)
                        * b.f_stream * 2.2
                        / (b.f_stream + 1.2 * (0.25 + 0.75 * b.dlen / st.ad))
                      ELSE 0 END) AS score,
                     (b.f_vector + b.f_join + b.f_stream) AS hits
              FROM base b CROSS JOIN st),
       sp AS (SELECT doc_id, round(score, 4) AS bm25 FROM sc WHERE hits > 0),
       sp100 AS (SELECT doc_id,
                        row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rn
                 FROM sp ORDER BY bm25 DESC, doc_id LIMIT 100),
       e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
             WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])) > 0),
       qv AS (SELECT v AS qv FROM e WHERE vec_id = $DenseQueryId),
       dn AS (SELECT vec_id, round(list_cosine_similarity(qv, v), 6) AS sim
              FROM e CROSS JOIN qv WHERE vec_id <> $DenseQueryId),
       dn100 AS (SELECT vec_id AS doc_id,
                        row_number() OVER (ORDER BY sim DESC, vec_id) AS cos_rn
                 FROM dn ORDER BY sim DESC, vec_id LIMIT 100),
       f AS (SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
                    COALESCE(CAST(floor(1000000000000.0 / (60 + s.bm25_rn)) AS BIGINT), 0)
                  + COALESCE(CAST(floor(1000000000000.0 / (60 + d.cos_rn)) AS BIGINT), 0) AS rrf,
                    CAST(s.bm25_rn AS INTEGER) AS bm25_rn,
                    CAST(d.cos_rn AS INTEGER) AS cos_rn
             FROM sp100 s FULL OUTER JOIN dn100 d ON s.doc_id = d.doc_id)
       SELECT doc_id, rrf, bm25_rn, cos_rn
       FROM f ORDER BY rrf DESC, doc_id LIMIT 20""") { (s, d) =>
    val sparse = rankTop(
      TextOps.bm25Scores(s, d, FusionTerms),
      col("bm25"), col("doc_id"), "bm25_rn")
      .select(col("doc_id"), col("bm25_rn"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
      .filter(col("nv") > 0)
    val qv = e.filter(col("vec_id") === DenseQueryId)
      .select(col("v").as("qv"), col("nv").as("qn"))
    val scored = e.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= DenseQueryId)
      .select(col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nv")), 6).as("sim"))
    val dense = rankTop(scored, col("sim"), col("vec_id"), "cos_rn")
      .select(col("vec_id").as("doc_id"), col("cos_rn"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (rrfTerm(col("bm25_rn")) + rrfTerm(col("cos_rn"))).as("rrf"),
        col("bm25_rn"), col("cos_rn"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(20)
  }

  /** Temperature-scaled language mixing (the multilingual-pretraining
    * resampler): sample language ℓ at rate ∝ n_ℓ^(1/2) / n_ℓ — i.e.
    * p(ℓ) ∝ sqrt(n_ℓ), temperature α = 0.5 — so dominant languages are
    * downsampled and rare ones kept nearly whole, targeting a corpus of
    * 25% of the input. Per-row keep decisions hash only doc_id (16-bit
    * md5 bucket vs a per-language integer threshold), so the sample is
    * reproducible across runs, engines, and partitionings, and
    * restartable at 100 TB — rand() is not.
    *
    * α = 0.5 (sqrt) rather than the also-common 0.7: sqrt is an IEEE
    * basic operation (correctly rounded everywhere), so the per-language
    * weights — and therefore the thresholds — are bit-identical across
    * engines; pow(x, 0.7) is libm and is not. The weight sum is
    * quantized to 2^30 longs (ExactSum rationale) so the normalizer is
    * an order-independent integer sum.
    *
    * Scale design: the language histogram is one map-side-combined agg
    * (|langs| rows); thresholds broadcast back; the keep filter is pure
    * map-side. Nothing shuffles the corpus. */
  val qTemperatureMix: Q = Q(
    "q_temperature_mix",
    """WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
       q AS (SELECT lang, n_docs,
                    CAST(floor(sqrt(n_docs) * 1073741824.0 + 0.5) AS BIGINT) AS qs
             FROM n),
       tot AS (SELECT CAST(sum(qs) AS BIGINT) AS qtot,
                      CAST(sum(n_docs) AS BIGINT) AS ntot FROM q),
       th AS (SELECT lang, n_docs,
                     CAST(floor(least(1.0,
                       ((0.25 * ntot) * qs) / (qtot * n_docs)) * 65536) AS BIGINT) AS threshold
              FROM q CROSS JOIN tot),
       k AS (SELECT d.lang, count(*) AS kept
             FROM documents d JOIN th ON d.lang = th.lang
             WHERE th.threshold >= 65536
                OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) <
                   printf('%04x', th.threshold)
             GROUP BY d.lang)
       SELECT th.lang, th.n_docs, th.threshold,
              CAST(COALESCE(k.kept, 0) AS BIGINT) AS kept
       FROM th LEFT JOIN k ON th.lang = k.lang
       ORDER BY th.lang""") { (s, d) =>
    val docs = Tables.documents(s, d)
    val n = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val q = n.withColumn("qs",
      floor(sqrt(col("n_docs")) * lit(1073741824.0) + lit(0.5)))
    val tot = q.agg(sum("qs").as("qtot"), sum("n_docs").as("ntot"))
    // ((0.25·ntot)·qs) / (qtot·n_docs), parenthesized IDENTICALLY to the
    // oracle: each step is one correctly-rounded IEEE op, so both engines
    // produce the same double and the same floored threshold
    val th = q.crossJoin(broadcast(tot))
      .withColumn("threshold",
        floor(least(lit(1.0),
          (lit(0.25) * col("ntot") * col("qs")) /
            (col("qtot") * col("n_docs"))) * lit(65536)))
      .select(col("lang"), col("n_docs"), col("threshold"))
    val bucket = substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 4)
    val kept = docs.join(broadcast(th.select("lang", "threshold")), Seq("lang"))
      .filter(col("threshold") >= 65536 ||
        bucket < lower(lpad(hex(col("threshold")), 4, "0")))
      .groupBy("lang").agg(count(lit(1)).as("kept"))
    th.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("threshold"),
        coalesce(col("kept"), lit(0L)).as("kept"))
      .orderBy("lang")
  }

  /** Per-source contribution cap (the "no single host dominates" rule of
    * web-corpus curation): keep at most 10 documents per source, chosen
    * by hash order (md5 prefix, doc_id tiebreak) so the survivors are a
    * deterministic uniform sample of each source, not its head.
    *
    * Scale design: one shuffle on source + a per-source window sort. At
    * 100 TB a skewed source would bottleneck its reducer — the fix is
    * the same salted two-stage top-M used by cluster-balanced sampling
    * (Similarity.qClusterSample): per-salt top-K first, then top-K
    * of the ≤ salt·K survivors; K here is small enough that the
    * single-stage window is the clearer declared form. */
  val qSourceCap: Q = Q(
    "q_source_cap",
    """WITH r AS (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY source
                            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8),
                                     doc_id) AS rk
                  FROM documents)
       SELECT doc_id, source, CAST(rk AS INTEGER) AS rk
       FROM r WHERE rk <= 10
       ORDER BY source, rk""") { (s, d) =>
    val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8)
    val w = Window.partitionBy("source").orderBy(h, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), row_number().over(w).as("rk"))
      .filter(col("rk") <= 10)
      .orderBy("source", "rk")
  }

  /** Token-length histogram with power-of-two buckets — the
    * sequence-length profile that sizes packing windows and flags
    * truncation loss before a training run. Bucket = floor(log2(ntok)),
    * computed as `length(bin(ntok)) - 1`: the binary-representation
    * length is integer-exact on both engines, where floor(log2(·)) via
    * libm misrounds exact powers of two (ln(8)/ln(2) = 2.9999…96).
    * Shares use ExactSum.intRatio — integer half-up, no float division.
    *
    * Scale design: one map-side-combined aggregate over ~60 buckets;
    * the token count per doc is a single codegen'd size(filter(split))
    * pass, no explode. */
  val qLengthHistogram: Q = Q(
    "q_length_histogram",
    """WITH t AS (SELECT len(list_filter(
                           regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '')) AS ntok
                  FROM documents),
       b AS (SELECT CAST(length(bin(ntok)) - 1 AS INTEGER) AS bucket, ntok
             FROM t WHERE ntok > 0),
       g AS (SELECT bucket, count(*) AS n_docs,
                    CAST(sum(ntok) AS BIGINT) AS tokens
             FROM b GROUP BY bucket),
       tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM g)
       SELECT bucket, n_docs, tokens,
              CAST((2 * 10000 * n_docs + total) // (2 * total) AS DOUBLE) / 10000 AS share
       FROM g CROSS JOIN tt
       ORDER BY bucket""") { (s, d) =>
    val toks = TextOps.tokens(lower(col("text")))
    val ntok = size(filter(toks, x => x =!= lit("")))
    val g = Tables.documents(s, d)
      .select(ntok.as("ntok"))
      .filter(col("ntok") > 0)
      .withColumn("bucket", (length(bin(col("ntok"))) - 1).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("tokens"))
    val tt = g.agg(sum("n_docs").as("total"))
    g.crossJoin(broadcast(tt))
      .select(col("bucket"), col("n_docs"), col("tokens"),
        ExactSum.intRatio(col("n_docs"), col("total"), 4).as("share"))
      .orderBy("bucket")
  }

  /** Inverted-index construction — the retrieval infrastructure BM25-at-
    * scale runs on (q_bm25_search deliberately scores index-free in one
    * pass; THIS op builds the index that makes point lookups cheap):
    * per term, document frequency, corpus frequency, and the posting
    * list of doc_ids — segmented by doc_id RANGE (width 128), the
    * Lucene-style layout where each segment owns a contiguous id range.
    *
    * Range segmentation, not rank-chunking, is the scale decision: the
    * segment key `doc_id div 128` is map-side computable, so posting
    * lists build with ONE hash aggregate on (term, segment) and no
    * per-term window — a rank-based chunking would funnel every posting
    * of a term through one reducer sort, exactly the stop-word skew that
    * kills index builds. Each aggregated list is bounded by the segment
    * width regardless of how hot the term is; per-term totals (df/cf)
    * re-aggregate from the vocabulary-sized frame. At 100 TB the same
    * two aggregates run per partition-pruned segment group; a production
    * build would also drop df-above-cap stop terms — the tiny synthetic
    * vocabulary here keeps the full index oracle-checkable instead.
    *
    * Determinism: postings serialize as the comma-joined ASCENDING
    * doc_id list (sort_array ≡ string_agg ORDER BY — exact strings,
    * no floats anywhere in the query). */
  val qInvertedIndex: Q = Q(
    "q_inverted_index",
    """WITH t AS (SELECT doc_id,
                         unnest(list_filter(
                           regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> x <> '')) AS term
                  FROM documents),
       stats AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
                 FROM t GROUP BY term),
       p AS (SELECT DISTINCT term, doc_id FROM t)
       SELECT p.term, CAST(doc_id // 128 AS INTEGER) AS segment,
              CAST(min(s.df) AS BIGINT) AS df, CAST(min(s.cf) AS BIGINT) AS cf,
              string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
       FROM p JOIN stats s USING (term)
       GROUP BY 1, 2
       ORDER BY term, segment""") { (s, d) =>
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(filter(TextOps.tokens(lower(col("text"))), _ =!= lit("")))
          .as("term"))
    val stats = t.groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
    t.select("term", "doc_id").distinct()
      .withColumn("segment", (col("doc_id") / lit(128)).cast("int"))
      .groupBy("term", "segment")
      .agg(array_join(
        transform(sort_array(collect_list(col("doc_id"))),
          _.cast("string")), ",").as("postings"))
      .join(broadcast(stats), "term")
      .select(col("term"), col("segment"), col("df"), col("cf"),
        col("postings"))
      .orderBy("term", "segment")
  }

  val all: Seq[Q] =
    Seq(qHybridSearch, qTemperatureMix, qSourceCap, qLengthHistogram,
      qInvertedIndex)
}
