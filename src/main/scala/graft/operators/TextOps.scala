package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators over the `documents` table (SURVEY.md §2.9 N4 +
  * the training-data-pipeline surface): tokenization, token counting,
  * quality scoring, language-ID heuristic, document fingerprinting, corpus
  * word frequencies.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (split / regexp_extract_all / higher-order filter / md5) — no UDFs — so
  * the whole pack stays inside WholeStageCodegen and scales linearly with
  * input: per-document ops are embarrassingly parallel (no shuffle at all),
  * and the only shuffling op is the corpus-level word-frequency aggregation
  * whose map-side partial aggregation reduces each partition to its
  * vocabulary first.
  */
object TextOps {

  /** Whitespace tokens of the (trimmed) text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
    * marks — a deterministic stand-in for a real BPE vocab's pre-splitter. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** NULL-guarded normalized-text fingerprint for JOIN-keyed dedup: md5 of
    * the whitespace-collapsed lowercase text, with NULL text mapped to a
    * sentinel class (md5(NULL) is NULL, and equi-joins DROP NULL keys — a
    * NULL-text doc would silently pass every index check and be
    * re-admitted forever; same hazard [[Dedup.dupClasses]] guards). The
    * sentinel cannot collide with a real fingerprint (8 chars vs 32 hex).
    * The batch and streaming ingest-dedup twins MUST share this exact
    * expression — diverging normalizations would fingerprint the same
    * text differently across the two paths. Group-by-keyed fingerprints
    * (q_fingerprint, q_dedup_fingerprint) stay unguarded: GROUP BY treats
    * NULLs as equal in both engines, and their oracles hash the raw
    * md5-or-NULL value. */
  private[graft] def normalizedFp(c: Column): Column =
    coalesce(
      md5(regexp_replace(trim(lower(c)), "\\s+", " ").cast("binary")),
      lit("__null__"))

  /** One-pass per-row counters (tokens, BPE tokens, punct/digit/CJK chars,
    * per-language stopword hits) — graft.functions.TextProfile. The
    * three profile-backed queries each replaced ~10 regex scans and
    * interpreted higher-order filter() lambdas per row. */
  private def profile(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.TextProfile(ColumnBridge.expression(c)))
  }

  /** Per-document stats: token counts (whitespace + BPE-ish), char length,
    * average token length. */
  val qTextStats: Q = Q(
    "q_text_stats",
    """SELECT doc_id,
              CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
              CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
              CAST(length(text) AS INTEGER) AS n_chars_measured,
              CAST((20000 * length(replace(trim(text), ' ', ''))
                    + len(regexp_split_to_array(trim(text), '\s+')))
                   // (2 * len(regexp_split_to_array(trim(text), '\s+')))
                   AS DOUBLE) / 10000 AS avg_token_len
       FROM documents
       ORDER BY doc_id""") { (s, d) =>
    // integer ratios round half-up in pure integer arithmetic
    // (ExactSum.intRatio): round(double, 4) resolves exact decimal ties
    // differently across engines
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), profile(col("text")).as("__p"))
      .select(col("doc_id"),
        col("__p.n_tokens").as("n_tokens"),
        col("__p.n_bpe").as("n_bpe_tokens"),
        length(col("text")).as("n_chars_measured"),
        ExactSum.intRatio(col("__p.n_nonspace"), col("__p.n_tokens"), 4)
          .as("avg_token_len"))
      .orderBy("doc_id")
  }

  /** Quality scoring: stopword ratio, punctuation ratio, digit ratio, and a
    * composite keep/drop signal — the usual cheap pre-filters of a training
    * data pipeline. */
  /** `num / length(text)` that yields NULL on an empty string like
    * DuckDB's division does — under ANSI Spark the raw division THROWS
    * (DIVIDE_BY_ZERO), so one empty document would kill a corpus job and
    * break oracle parity at once. */
  private[graft] def perCharRatio(num: Column): Column =
    when(length(col("text")) > 0, num.cast("double") / length(col("text")))

  val qTextQuality: Q = Q(
    "q_text_quality",
    """WITH t AS (SELECT doc_id, text,
                         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                  FROM documents)
       SELECT doc_id,
              CAST((20000 * len(list_filter(toks, x -> x IN ('the','a','and','of','to')))
                    + len(toks)) // (2 * len(toks)) AS DOUBLE) / 10000
                AS stopword_ratio,
              CASE WHEN length(text) > 0 THEN
                CAST((20000 * len(regexp_extract_all(text, '[^a-zA-Z0-9\s]'))
                      + length(text)) // (2 * length(text)) AS DOUBLE) / 10000
              END AS punct_ratio,
              CASE WHEN length(text) > 0 THEN
                CAST((20000 * len(regexp_extract_all(text, '[0-9]'))
                      + length(text)) // (2 * length(text)) AS DOUBLE) / 10000
              END AS digit_ratio,
              CASE WHEN len(toks) BETWEEN 10 AND 100000
                        AND CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
                            / length(text) < 0.1
                   THEN true ELSE false END AS keep
       FROM t
       ORDER BY doc_id""") { (s, d) =>
    val punctRatio = perCharRatio(col("__p.n_punct"))
    // rounded ratios go through ExactSum.intRatio (integer half-up — see
    // q_text_stats); the RAW punctRatio in `keep` compares identically on
    // both engines (same doubles) and stays as is
    def guarded(num: org.apache.spark.sql.Column) =
      when(length(col("text")) > 0,
        ExactSum.intRatio(num, length(col("text")), 4))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), profile(col("text")).as("__p"))
      .select(col("doc_id"),
        ExactSum.intRatio(col("__p.s_en"), col("__p.n_tokens"), 4)
          .as("stopword_ratio"),
        guarded(col("__p.n_punct")).as("punct_ratio"),
        guarded(col("__p.n_digit")).as("digit_ratio"),
        (col("__p.n_tokens").between(10, 100000) && punctRatio < 0.1).as("keep"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: CJK characters → zh; otherwise score each
    * latin language by stopword hits and pick the argmax with a fixed
    * precedence (en > de > es > fr). Compared with the labeled `lang`
    * column so accuracy is measurable downstream. */
  val qLangGuess: Q = Q(
    "q_lang_guess",
    """WITH t AS (SELECT doc_id, lang, text,
                         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                  FROM documents),
            s AS (SELECT doc_id, lang,
                         len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh,
                         len(list_filter(toks, x -> x IN ('the','a','and','of','to')))  AS s_en,
                         len(list_filter(toks, x -> x IN ('der','die','das','und','zu'))) AS s_de,
                         len(list_filter(toks, x -> x IN ('el','la','de','y','que')))   AS s_es,
                         len(list_filter(toks, x -> x IN ('le','la','et','les','des'))) AS s_fr
                  FROM t)
       SELECT doc_id, lang,
              CASE WHEN s_zh > 0 THEN 'zh'
                   WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                   WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
                   WHEN s_es >= s_fr THEN 'es'
                   ELSE 'fr' END AS lang_guess
       FROM s
       ORDER BY doc_id""") { (s, d) =>
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), profile(col("text")).as("__p"))
      .select(col("doc_id"), col("lang"),
        col("__p.n_cjk").as("s_zh"),
        col("__p.s_en").as("s_en"), col("__p.s_de").as("s_de"),
        col("__p.s_es").as("s_es"), col("__p.s_fr").as("s_fr"))
    scored.select(col("doc_id"), col("lang"),
      when(col("s_zh") > 0, "zh")
        .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr").as("lang_guess"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text —
    * the exact-dedup key for content-identical documents that differ only
    * in spacing/case. */
  val qFingerprint: Q = Q(
    "q_fingerprint",
    """SELECT doc_id,
              md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
       FROM documents
       ORDER BY doc_id""") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ").cast("binary"))
          .as("fp"))
      .orderBy("doc_id")
  }

  /** Winnowing (rolling-hash) fingerprints: per-document fingerprint-set
    * stats. The sets themselves feed near-dup overlap joins (share a
    * fingerprint ⇒ share a ≥23-char substring); here the deterministic
    * per-doc summary is the declared surface, property-tested in
    * TextOpsSpec.
    *
    * The DuckDB twin reproduces the polynomial hash EXACTLY: the rolling
    * recurrence is just the k-gram polynomial sum_{j} cp_j * B^(k-1-j)
    * in wrapping 64-bit arithmetic, so the oracle precomputes B^e mod 2^64
    * as HUGEINT literals, sums cp * weight per k-gram, reduces mod 2^64,
    * winnows per disjoint 16-gram window, and two's-complements back to
    * the signed BIGINT Spark emits. Java's Character.isLetterOrDigit is
    * \p{L}+\p{Nd} over BMP codepoints (the corpus has no astral chars, so
    * UTF-16 units == codepoints). */
  val qWinnowFingerprint: Q = Q(
    "q_winnow_fingerprint",
    """WITH norm AS (
         SELECT doc_id, regexp_replace(lower(text), '[^\p{L}\p{Nd}]', '', 'g') AS s
         FROM documents),
       chars AS (
         SELECT doc_id, u.i AS pos, unicode(substr(s, u.i, 1))::HUGEINT AS cp
         FROM norm, unnest(range(1, length(s) + 1)) AS u(i)),
       pw AS (
         SELECT * FROM (VALUES
           (0, 12924618581234127435::HUGEINT),
           (1, 10923514805226455897::HUGEINT),
           (2, 14453212906556403763::HUGEINT),
           (3, 14003818205314896721::HUGEINT),
           (4, 1000009000027000027::HUGEINT),
           (5, 1000006000009::HUGEINT),
           (6, 1000003::HUGEINT),
           (7, 1::HUGEINT)) AS v(j, p)),
       grams AS (
         -- sign-convert BEFORE winnowing: the engine's per-window min is a
         -- SIGNED Java-long comparison, not an unsigned mod-2^64 one
         SELECT doc_id, start,
                CASE WHEN h >= 9223372036854775808::HUGEINT
                     THEN (h - 18446744073709551616::HUGEINT)::BIGINT
                     ELSE h::BIGINT END AS hs
         FROM (
           SELECT c.doc_id, c.pos - pw.j AS start,
                  (sum(c.cp * pw.p) % 18446744073709551616::HUGEINT) AS h
           FROM chars c JOIN pw ON c.pos - pw.j >= 1
           GROUP BY 1, 2 HAVING count(*) = 8)),
       wins AS (
         SELECT doc_id, (start - 1) // 16 AS widx, min(hs) AS mh
         FROM grams GROUP BY 1, 2),
       fps AS (
         SELECT DISTINCT doc_id, mh AS fp FROM wins),
       agg AS (
         SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fp
         FROM fps GROUP BY doc_id)
       SELECT d.doc_id,
              COALESCE(a.n_fingerprints, 0) AS n_fingerprints,
              a.min_fp
       FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
       ORDER BY d.doc_id""") { (s, d) =>
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val fps = ColumnBridge.column(graft.functions.WinnowFingerprints(
      ColumnBridge.expression(col("text")), 8, 16))
    Tables.documents(s, d)
      .select(col("doc_id"), fps.as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        // docs shorter than k chars yield an empty array; NULL min_fp then,
        // like the oracle's LEFT JOIN (plain element_at throws under ANSI)
        try_element_at(col("fps"), lit(1)).as("min_fp"))
      .orderBy("doc_id")
  }

  /** Corpus-level word frequency: top-50 tokens. Explode → map-side partial
    * count → final count; the shuffle carries at most |vocab| rows per
    * partition. */
  val qWordFreq: Q = Q(
    "q_word_freq",
    """SELECT w, count(*) AS n
       FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
             FROM documents)
       WHERE w <> ''
       GROUP BY w
       ORDER BY n DESC, w
       LIMIT 50""") { (s, d) =>
    Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(50)
  }

  /** Shannon character entropy per document — the low-entropy filter of a
    * training pipeline (catches repeated-char spam, base64 blobs score
    * high, natural text sits ~4-4.5 bits). Two hash aggregations:
    * (doc, char) counts then per-doc entropy; n comes from sum(k), not
    * length(), so both engines count the same units. */
  val qCharEntropy: Q = Q(
    "q_char_entropy",
    """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
                   FROM documents),
       f AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
       t AS (SELECT doc_id, sum(k) AS n FROM f GROUP BY 1)
       SELECT f.doc_id,
              round(-(CAST(sum(CAST(floor((k / CAST(n AS DOUBLE))
                                          * (ln(k / CAST(n AS DOUBLE)) / ln(2))
                                          * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 1073741824), 6)
                AS entropy
       FROM f JOIN t USING (doc_id)
       GROUP BY f.doc_id ORDER BY f.doc_id""") { (s, d) =>
    // one pass per row (graft.functions.CharEntropy), zero shuffle — the
    // explode-per-character formulation this replaces shuffled one row
    // per CHARACTER of the corpus twice (150M exploded rows at sf1)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val ent = ColumnBridge.column(
      graft.functions.CharEntropy(ColumnBridge.expression(col("text"))))
    Tables.documents(s, d)
      .select(col("doc_id"), ent.as("ent"))
      .where(col("ent").isNotNull)
      .select(col("doc_id"), round(col("ent"), 6).as("entropy"))
      .orderBy("doc_id")
  }

  /** Repetition quality gate (Gopher/FineWeb-style): duplicate-token
    * fraction, most-common-token coverage and most-common-bigram coverage
    * per document, plus the composite keep decision (drop documents whose
    * top token covers >30% or whose top adjacent bigram covers >20% of the
    * text). One per-row pass (graft.functions.RepetitionProfile) — zero
    * shuffle; the declarative twin explodes every token AND bigram of the
    * corpus into rows and re-aggregates twice. Only counts cross the
    * expression boundary, so mode ties can't leak nondeterminism; the keep
    * predicate reads the ROUNDED ratios on both sides so a boundary value
    * decides identically in Spark and DuckDB. */
  val qRepetitionProfile: Q = Q(
    "q_repetition_profile",
    """WITH t AS (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                  FROM documents),
            b AS (SELECT doc_id, toks,
                         list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
                  FROM t),
            r AS (SELECT doc_id,
                         CAST(len(toks) AS INTEGER) AS n_tokens,
                         CAST((20000 * (len(toks) - len(list_distinct(toks)))
                               + len(toks)) // (2 * len(toks)) AS DOUBLE) / 10000
                           AS dup_token_ratio,
                         CAST((20000 * len(list_filter(toks,
                                             x -> x = list_aggregate(toks, 'mode')))
                               + len(toks)) // (2 * len(toks)) AS DOUBLE) / 10000
                           AS top_token_ratio,
                         CASE WHEN len(bigrams) = 0 THEN NULL
                              ELSE CAST((20000 * len(list_filter(bigrams,
                                             x -> x = list_aggregate(bigrams, 'mode')))
                                         + len(bigrams)) // (2 * len(bigrams))
                                        AS DOUBLE) / 10000
                              END AS top_bigram_ratio
                  FROM b)
       SELECT doc_id, n_tokens, dup_token_ratio, top_token_ratio, top_bigram_ratio,
              (top_token_ratio <= 0.3
               AND coalesce(top_bigram_ratio, 0) <= 0.2) AS keep
       FROM r ORDER BY doc_id""") { (s, d) =>
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rep = ColumnBridge.column(
      graft.functions.RepetitionProfile(ColumnBridge.expression(col("text"))))
    Tables.documents(s, d)
      .select(col("doc_id"), rep.as("__r"))
      .select(col("doc_id"),
        col("__r.n_tokens").as("n_tokens"),
        // integer half-up ratios (ExactSum.intRatio): see q_text_stats
        ExactSum.intRatio(col("__r.n_tokens") - col("__r.n_distinct"),
          col("__r.n_tokens"), 4).as("dup_token_ratio"),
        ExactSum.intRatio(col("__r.top_token"), col("__r.n_tokens"), 4)
          .as("top_token_ratio"),
        when(col("__r.n_bigrams") === 0, lit(null).cast("double"))
          .otherwise(ExactSum.intRatio(col("__r.top_bigram"),
            col("__r.n_bigrams"), 4))
          .as("top_bigram_ratio"))
      .withColumn("keep",
        col("top_token_ratio") <= 0.3 &&
          coalesce(col("top_bigram_ratio"), lit(0.0)) <= 0.2)
      .orderBy("doc_id")
  }

  /** Corpus-LM quality score: train a unigram language model on the corpus
    * itself (token → count), then score every document by its mean token
    * log-probability and perplexity — the KenLM-style "does this look like
    * the rest of the corpus" filter of a pretraining pipeline (gibberish
    * and OCR noise score far below fluent text).
    *
    * Scale design: pass 1 is a hash aggregation whose map-side combine
    * reduces each partition to its vocabulary before the shuffle; the
    * model IS that aggregate, so there is no separate training job. Pass 2
    * re-joins tokens to the model on the token key — AQE broadcasts the
    * model when it fits (it always does here) and falls back to a plain
    * shuffle equi-join when a web-scale vocabulary doesn't; either way the
    * work is linear in corpus tokens. The corpus-total row is a 1-row
    * broadcast cross join, not a collect. A production variant caps the
    * model at top-V tokens with an OOV floor to bound the join side
    * unconditionally; uncapped keeps this oracle-exact. */
  val qUnigramLogprob: Q = Q(
    "q_unigram_logprob",
    """WITH t AS (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                  FROM documents),
            u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
            g AS (SELECT doc_id, tok, count(*) AS k FROM u GROUP BY 1, 2),
            f AS (SELECT tok, sum(k) AS c FROM g GROUP BY tok),
            n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM f),
            p AS (SELECT g.doc_id,
                         CAST(sum(g.k) AS INTEGER) AS n_tokens,
                         CAST(sum(CAST(floor(g.k * ln(f.c / n.n) * 1073741824 + 0.5)
                                       AS BIGINT)) AS DOUBLE) / 1073741824 AS lsum
                  FROM g JOIN f USING (tok) CROSS JOIN n
                  GROUP BY g.doc_id)
       SELECT doc_id, n_tokens,
              round(lsum / n_tokens, 4) AS avg_logprob,
              round(exp(-(lsum / n_tokens)), 2) AS perplexity
       FROM p ORDER BY doc_id""") { (s, d) =>
    // (doc, tok) multiplicities first (exact integer counts), then the LM
    // score is an ExactSum of k·ln(p) terms — order-independent where
    // avg() over exploded instances merged partials in task order
    val g = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(tokens(lower(col("text")))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("k"))
    val model = g.groupBy("tok").agg(sum("k").as("c"))
    val total = model.agg(sum("c").cast("double").as("n"))
    val lp = log(col("c") / col("n"))
    g.join(model, "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("k").cast("int").as("n_tokens"),
        ExactSum.qsum(col("k") * lp).as("ls"))
      .select(col("doc_id"), col("n_tokens"),
        round(ExactSum.value(col("ls")) / col("n_tokens"), 4).as("avg_logprob"),
        round(exp(-(ExactSum.value(col("ls")) / col("n_tokens"))), 2)
          .as("perplexity"))
      .orderBy("doc_id")
  }

  /** Source-distribution drift: KL divergence of each source's unigram
    * distribution from the whole-corpus distribution — the monitoring
    * statistic that catches a crawl source going off-distribution (spam
    * floods, language shifts, template noise) before it pollutes a
    * training mix. KL(p_source ‖ p_corpus) is finite by construction: the
    * corpus distribution dominates every source (q > 0 wherever p > 0).
    *
    * Scale design: ONE corpus pass — the (source × token) hash aggregate —
    * and everything else derives from that far smaller frame: per-source
    * totals, the global token distribution (re-aggregated from the
    * source×token counts, not the corpus) and the KL sum. The only join is
    * source×token ⋈ token on the vocabulary key; AQE broadcasts the global
    * side when it fits. Output is O(#sources). */
  val qSourceDivergence: Q = Q(
    "q_source_divergence",
    """WITH u AS (SELECT source,
                         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                  FROM documents),
            sc AS (SELECT source, tok, count(*) AS c FROM u GROUP BY 1, 2),
            st AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
            g  AS (SELECT tok, sum(c) AS gc FROM sc GROUP BY 1),
            gt AS (SELECT sum(gc) AS gn FROM g)
       SELECT sc.source,
              CAST(st.n AS BIGINT) AS n_tokens,
              CAST(count(*) AS INTEGER) AS n_vocab,
              round(CAST(sum(CAST(floor((sc.c / CAST(st.n AS DOUBLE))
                                        * ln((sc.c / CAST(st.n AS DOUBLE))
                                             / (g.gc / CAST(gt.gn AS DOUBLE)))
                                        * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE)
                    / 1073741824, 4)
                AS kl_from_corpus
       FROM sc JOIN st USING (source) JOIN g USING (tok) CROSS JOIN gt
       GROUP BY sc.source, st.n
       ORDER BY sc.source""") { (s, d) =>
    // materialize the source×token aggregate ONCE: three consumers hang
    // off it (per-source totals, global distribution, the KL join) and
    // exchange reuse alone re-scans the corpus for some of them (measured:
    // 6 scans without the cut, 1 with). The checkpointed frame is
    // vocabulary-sized, not corpus-sized.
    val sc = Tables.documents(s, d)
      .select(col("source"), explode(tokens(lower(col("text")))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val st = sc.groupBy("source").agg(sum("c").as("n"))
    val g = sc.groupBy("tok").agg(sum("c").as("gc"))
    val gt = g.agg(sum("gc").as("gn"))
    val p = col("c") / col("n").cast("double")
    val q = col("gc") / col("gn").cast("double")
    sc.join(st, "source")
      .join(g, "tok")
      .crossJoin(broadcast(gt))
      .groupBy("source", "n")
      .agg(count(lit(1)).cast("int").as("n_vocab"),
        // ExactSum: the KL reduction over the vocabulary is an integer sum
        // of quantized p·ln(p/q) terms, order-independent on both engines
        round(ExactSum.value(ExactSum.qsum(p * log(p / q))), 4)
          .as("kl_from_corpus"))
      .select(col("source"), col("n").as("n_tokens"), col("n_vocab"),
        col("kl_from_corpus"))
      .orderBy("source")
  }

  /** BPE merge-candidate statistics — the first iteration of tokenizer
    * training: adjacent character-pair frequencies over the corpus, each
    * pair weighted by how often its word occurs. The top pair is the
    * first merge a BPE trainer would make; re-running after applying a
    * merge iterates the algorithm.
    *
    * Scale design — the trick every real BPE trainer uses, expressed
    * relationally: aggregate the corpus to its WORD HISTOGRAM first (one
    * hash-agg pass whose map-side combine collapses each partition to its
    * vocabulary), then explode character pairs over the histogram only —
    * the expensive per-character explode runs over |vocab| rows, not
    * corpus tokens, and each pair row carries the word's count as its
    * weight. At 100 TB the histogram is millions of rows where the corpus
    * is trillions of tokens; the pair aggregate is map-side combined and
    * top-50 is a TakeOrdered, not a global sort. */
  val qBpeMerges: Q = Q(
    "q_bpe_merges",
    """WITH w AS (SELECT tok, count(*) AS c
                  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                        FROM documents)
                  WHERE tok <> ''
                  GROUP BY tok),
       p AS (SELECT substr(tok, u.i, 2) AS pair, c
             FROM w, unnest(range(1, length(tok))) AS u(i)
             WHERE length(tok) >= 2)
       SELECT pair, CAST(sum(c) AS BIGINT) AS n
       FROM p GROUP BY pair
       ORDER BY n DESC, pair
       LIMIT 50""") { (s, d) =>
    val vocab = Tables.documents(s, d)
      .select(explode(tokens(lower(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
    vocab
      .filter(length(col("tok")) >= 2)
      .select(col("tok"), col("c"),
        explode(sequence(lit(1), length(col("tok")) - 1)).as("i"))
      .select(expr("substring(tok, i, 2)").as("pair"), col("c"))
      .groupBy("pair").agg(sum("c").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(50)
  }

  /** BM25 keyword retrieval (N25): top-20 documents for the fixed query
    * {vector, join, stream} under Okapi BM25 (k1 = 1.2, b = 0.75, Lucene's
    * +1 idf form) — the curation-side retrieval primitive: "pull the
    * documents most relevant to this topic" for targeted corpus
    * construction or contamination triage.
    *
    * Scale design (100 TB): NO inverted index and NO explode — per-doc
    * term frequencies for the (tiny) query come from a codegen
    * `size(filter(...))` over the token array, so the corpus is read
    * exactly once, map-only, into a |docs| × (1 + |query|) frame
    * (checkpointed: the corpus-wide df/avgdl stats and the scorer both
    * read it). The stats are a single-row aggregate broadcast back; the
    * final top-20 is a TakeOrdered, no global sort materialized. */
  val qBm25Search: Q = Q(
    "q_bm25_search",
    """WITH t AS (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
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
              FROM base b CROSS JOIN st)
       SELECT doc_id, round(score, 4) AS bm25
       FROM sc WHERE hits > 0
       ORDER BY round(score, 4) DESC, doc_id LIMIT 20""") { (s, d) =>
    bm25Scores(s, d, Seq("vector", "join", "stream"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** Per-document BM25 scores (rounded 4dp) for `queryTerms` — the scorer
    * behind q_bm25_search, shared with the hybrid-retrieval fusion
    * (Retrieval.qHybridSearch). One map-only corpus pass, single-row
    * stats broadcast — see qBm25Search's scale note. */
  private[operators] def bm25Scores(
      s: SparkSession, d: String, queryTerms: Seq[String]): DataFrame = {
    val toks = tokens(lower(col("text")))
    // one corpus pass → per-doc length + per-term tf, all map-only codegen;
    // checkpointed because the stats aggregate and the scorer both read it
    val base = Tables.documents(s, d)
      .select(Seq(col("doc_id"),
        size(toks).cast("double").as("dlen")) ++
        queryTerms.map(tm =>
          size(filter(toks, x => x === lit(tm))).cast("double").as(s"f_$tm")): _*)
      .localCheckpoint()
    val stCols = Seq(
      count(lit(1)).cast("double").as("n"),
      avg("dlen").as("ad")) ++
      queryTerms.map(tm =>
        sum(when(col(s"f_$tm") > 0, lit(1.0)).otherwise(lit(0.0)))
          .as(s"df_$tm"))
    val st = base.agg(stCols.head, stCols.tail: _*)
    // same arithmetic form as the oracle: Lucene idf, the (k1+1)=2.2
    // numerator, (1 - b + b·dlen/avgdl) length normalization
    def term(tm: String) = when(col(s"f_$tm") > 0,
      log((col("n") - col(s"df_$tm") + lit(0.5)) / (col(s"df_$tm") + lit(0.5))
        + lit(1.0))
        * col(s"f_$tm") * lit(2.2)
        / (col(s"f_$tm") + lit(1.2) *
          (lit(0.25) + lit(0.75) * col("dlen") / col("ad"))))
      .otherwise(lit(0.0))
    base.crossJoin(broadcast(st))
      .filter(queryTerms.map(tm => col(s"f_$tm") > 0).reduce(_ || _))
      .select(col("doc_id"),
        round(queryTerms.map(term).reduce(_ + _), 4).as("bm25"))
  }

  /** Adjacent symbol pairs of a symbol array, weighted later by word
    * count — `sequence` guarded against the <2-symbol case (ANSI would
    * fault on a descending sequence). */
  private def symPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("a"),
          element_at(syms, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))

  /** One BPE merge (a, b) → ab applied left-to-right over a symbol array:
    * a higher-order fold — append each symbol unless the accumulator ends
    * in `a` and the symbol is `b`, in which case replace that tail with
    * the merged symbol. `try_element_at` keeps the empty-accumulator probe
    * NULL-safe under ANSI (no short-circuit in SQL boolean AND). */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Unsigned UTF-8 byte comparison — Spark's string sort order, so the
    * driver-side trainer breaks ties exactly as the r8 engine's
    * `orderBy(n desc, a, b)` did (Java String.compareTo orders by UTF-16
    * code unit and diverges on supplementary characters). */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** Train `k` BPE merges over a (tok, c) word histogram: each round takes
    * the most frequent adjacent symbol pair weighted by word count (ties
    * to the UTF-8-lexically first — fully deterministic) and folds the
    * merge left-to-right into every word holding it. Returns the learned
    * merges and the final encode table (tok → syms).
    *
    * Scale design (VERDICT r8 #4): the vocab histogram COLLECTS ONCE and
    * the full merge table trains DRIVER-SIDE with incremental pair-count
    * maintenance — each round touches only the words containing the
    * merged pair, so k = 32768 real-tokenizer merges cost seconds, not
    * 32768 Spark jobs (the r8 form's wall: one vocab-sized job per
    * round). The histogram is driver-bounded the way real BPE trainers
    * bound it: distinct WORDS, not corpus tokens — tens of millions of
    * rows at web scale, and `topV` caps it top-V by count (coverage loss
    * is the standard tokenizer trade) if a pathological corpus — hundreds
    * of millions of distinct "words": URLs, hashes, junk — would overflow
    * the driver. The cap is deterministic ((c desc, tok asc), so boundary
    * ties break lexically) and NEVER silent: the returned accounting
    * names the dropped distinct words and their count mass, and when the
    * cap doesn't engage the merge sequence is identical to the uncapped
    * run (the collected histogram SET is unchanged; training is
    * row-order-independent). Only the encode JOIN stays distributed: the
    * corpus never re-runs BPE per token (see qBpeEncode).
    *
    * Semantics are bit-identical to the r8 per-round engine form
    * (TextOpsSpec pins the merge sequence against an independent witness;
    * BpeScaleProbe re-checks k=32 ≡ prefix of k=1024): same per-codepoint
    * initial split as the old `substr` transform, same left-to-right
    * non-overlapping merge application as [[applyMerge]]'s fold, same
    * (count desc, pair asc) selection. */
  private[graft] def trainBpe(vocab: DataFrame, k: Int)
      : (Seq[(String, String)], DataFrame) = {
    val (merges, enc, _) = trainBpe(vocab, k, Int.MaxValue)
    (merges, enc)
  }

  /** Dropped-vocabulary accounting of a capped [[trainBpe]] run — the
    * no-silent-caps contract: zero/zero when the cap didn't engage. */
  private[graft] final case class BpeCapReport(
      droppedWords: Long, droppedCountMass: Long)

  private[graft] def trainBpe(vocab: DataFrame, k: Int, topV: Int)
      : (Seq[(String, String)], DataFrame, BpeCapReport) = {
    val spark = vocab.sparkSession
    // the ADVICE r9 / VERDICT r9 #2 driver-OOM escape hatch, now real
    // code: cap BEFORE the collect. TakeOrderedAndProject keeps the cap
    // itself executor-side — the driver only ever sees ≤ topV rows.
    val capped =
      if (topV == Int.MaxValue) vocab.select(col("tok"), col("c"))
      else vocab.select(col("tok"), col("c"))
        .orderBy(desc("c"), col("tok")).limit(topV)
    val rows = capped.collect()
    val cap =
      if (topV == Int.MaxValue) BpeCapReport(0L, 0L)
      else {
        val t = vocab.agg(count(lit(1)), coalesce(sum("c"), lit(0L)))
          .head()
        BpeCapReport(
          droppedWords = t.getLong(0) - rows.length,
          droppedCountMass = t.getLong(1) - rows.map(_.getLong(1)).sum)
      }
    // per-CODEPOINT split, the old engine's substr(i, 1) semantics
    val words: Array[Array[String]] = rows.map { r =>
      val t = r.getString(0)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    val wc: Array[Long] = rows.map(_.getLong(1))

    import scala.collection.mutable
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def pairsOf(ss: Array[String]): Iterator[(String, String)] =
      if (ss.length < 2) Iterator.empty
      else (0 until ss.length - 1).iterator.map(i => (ss(i), ss(i + 1)))
    def addWord(w: Int): Unit = pairsOf(words(w)).foreach { p =>
      pairCounts.update(p, pairCounts.getOrElse(p, 0L) + wc(w))
      pairWords.getOrElseUpdate(p, mutable.Set.empty) += w
    }
    def dropWord(w: Int): Unit = pairsOf(words(w)).foreach { p =>
      val n = pairCounts(p) - wc(w)
      if (n == 0L) { pairCounts.remove(p); pairWords.remove(p) }
      else {
        pairCounts.update(p, n)
        // the word may hold the pair at several positions; the set keeps
        // one entry, removed only when the LAST occurrence goes — cheap
        // to re-derive: after the merge, re-adding below restores it
        pairWords(p) -= w
      }
    }
    words.indices.foreach(addWord)

    // left-to-right non-overlapping merge — applyMerge's fold, verbatim
    def apply1(ss: Array[String], a: String, b: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ss.length) {
        if (out.nonEmpty && out.last == a && ss(i) == b)
          out(out.length - 1) = a + b
        else out += ss(i)
        i += 1
      }
      out.toArray
    }

    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    while (round < k && pairCounts.nonEmpty) {
      var best: (String, String) = null
      var bestN = -1L
      pairCounts.foreach { case (p, n) =>
        if (n > bestN || (n == bestN &&
            (utf8Lt(p._1, best._1) ||
              (p._1 == best._1 && utf8Lt(p._2, best._2))))) {
          best = p; bestN = n
        }
      }
      merges += best
      val affected = pairWords.getOrElse(best, mutable.Set.empty).toArray
      affected.foreach { w =>
        dropWord(w)
        words(w) = apply1(words(w), best._1, best._2)
        addWord(w)
      }
      round += 1
    }

    // encode table back to a distributed frame (vocab-sized; parallelize
    // keeps the plan free of a giant LocalRelation)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tok",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("syms",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val data = rows.indices.map(i => org.apache.spark.sql.Row(
      rows(i).getString(0), wc(i), words(i).toSeq))
    val enc = spark.createDataFrame(
      spark.sparkContext.parallelize(data,
        math.max(1, math.min(32, data.length / 4096 + 1))), schema)
    (merges.result(), enc, cap)
  }

  /** DuckDB twin of the k=8 BPE train+encode (ORACLE promotion, r9):
    * "iterative training is not SQL-expressible" was only true for
    * UNBOUNDED k — at the query's FIXED k=8 each round unrolls into
    * three CTEs (pair counts over the current symbol table → the single
    * best pair as a 1-row always-present frame via scalar subqueries,
    * NULL on exhaustion → the merge folded into every word's symbols
    * with the engine's exact left-to-right list_reduce). MATERIALIZED
    * keeps the chain linear (DuckDB re-evaluates multiply-referenced
    * CTEs otherwise: the un-hinted form never finished; hinted, 0.2 s
    * at sf0.01 / 7.1 s at sf1). Tie-break is (n DESC, a, b) under
    * DuckDB's binary UTF-8 collation — the trainer's utf8Lt, exactly. */
  private def bpeEncodeSql: String = {
    def round(i: Int): String = {
      val prev = s"s${i - 1}"
      s"""p$i AS MATERIALIZED (SELECT a, b, sum(c) AS n FROM (
           SELECT c, syms[j] AS a, syms[j+1] AS b
           FROM $prev, unnest(range(1, greatest(len(syms), 1))) t(j)
           WHERE len(syms) >= 2 AND j < len(syms))
          GROUP BY a, b),
        b$i AS MATERIALIZED (
          SELECT (SELECT a FROM (SELECT a, b FROM p$i ORDER BY n DESC, a, b LIMIT 1)) AS ma,
                 (SELECT b FROM (SELECT a, b FROM p$i ORDER BY n DESC, a, b LIMIT 1)) AS mb),
        s$i AS MATERIALIZED (SELECT tok, c,
            CASE WHEN ma IS NULL THEN syms
            ELSE list_reduce(list_prepend([]::VARCHAR[], [[x] FOR x IN syms]),
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = ma AND x[1] = mb
                          THEN list_append(acc[1:len(acc)-1], ma || mb)
                          ELSE list_append(acc, x[1]) END)
            END AS syms
          FROM $prev CROSS JOIN b$i)"""
    }
    val rounds = (1 to 8).map(round).mkString(",\n")
    s"""WITH toks AS MATERIALIZED (
         SELECT doc_id, unnest(list_filter(
           regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS tok
         FROM documents WHERE text IS NOT NULL),
       vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       s0 AS MATERIALIZED (SELECT tok, c,
         [substr(tok, CAST(i AS INTEGER), 1)
          FOR i IN range(1, strlen(tok)+1)] AS syms FROM vocab),
       $rounds,
       enc AS (SELECT tok, len(syms)::BIGINT AS bpe_len,
                      strlen(tok)::BIGINT AS n_chars FROM s8),
       dt AS (SELECT doc_id, tok, count(*) AS k FROM toks GROUP BY 1, 2)
       SELECT dt.doc_id,
              CAST(sum(k) AS BIGINT) AS n_words,
              CAST(sum(k * n_chars) AS BIGINT) AS n_chars,
              CAST(sum(k * bpe_len) AS BIGINT) AS n_bpe,
              round(CAST(sum(k * n_chars) AS DOUBLE) / sum(k * bpe_len), 4)
                AS chars_per_token
       FROM dt JOIN enc USING (tok)
       GROUP BY dt.doc_id ORDER BY doc_id"""
  }

  /** BPE tokenizer application (N26): the step after q_bpe_merges — TRAIN
    * 8 merges on the corpus' own word histogram, then ENCODE every
    * document with them and report words / chars / BPE tokens per doc.
    * This is the real token-counting a budget or packing stage needs once
    * a tokenizer exists, and the compression ratio is itself a quality
    * signal (gibberish compresses badly under corpus-trained merges).
    *
    * Scale design (100 TB): training touches only the vocab histogram
    * (see trainBpe); encoding never re-runs BPE per token — the corpus
    * joins the vocab-sized encode table (broadcast under AQE) keyed by
    * word, so the per-doc pass is explode + count + one broadcast join,
    * with all BPE arithmetic pre-computed per DISTINCT word.
    * ORACLE-PROMOTED (r9): the fixed k=8 unrolls into a DuckDB CTE chain
    * ([[bpeEncodeSql]]) — the driver now hash-compares the trained
    * merges' OUTPUT across engines; the law suite keeps the independent
    * Scala witness for the unbounded-k trainer. */
  val qBpeEncode: Q = Q("q_bpe_encode", bpeEncodeSql) { (s, d) =>
    val corpusToks = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(lower(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
    val vocab = corpusToks.groupBy("tok").agg(count(lit(1)).as("c"))
    // driver-OOM bound (VERDICT r9 #2): 2M distinct words ≈ hundreds of
    // MB collected — far above any test SF (sf10 ≈ 100k distinct), so the
    // cap never engages here and the oracle twin (which models no cap)
    // stays exact; at pathological web-corpus vocab it engages with named
    // accounting instead of OOMing the driver
    val (_, encodeTable, _) = trainBpe(vocab, 8, topV = 2000000)
    val enc = encodeTable
      .select(col("tok"), size(col("syms")).cast("long").as("bpe_len"),
        length(col("tok")).cast("long").as("n_chars"))
    corpusToks
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("k"))
      .join(enc, "tok")
      .groupBy("doc_id")
      .agg(sum("k").as("n_words"),
        sum(col("k") * col("n_chars")).as("n_chars"),
        sum(col("k") * col("bpe_len")).as("n_bpe"),
        round(sum(col("k") * col("n_chars")).cast("double") /
          sum(col("k") * col("bpe_len")), 4).as("chars_per_token"))
      .orderBy("doc_id")
  }

  /** Interpolated bigram LM scoring — the next step up from the N8
    * unigram LM (qUnigramLogprob) on the CCNet quality-filtering path:
    * each document scores by the mean log of the Jelinek-Mercer mixture
    * λ·P(wᵢ|wᵢ₋₁) + (1−λ)·P(wᵢ), λ = 0.5, where P(wᵢ|wᵢ₋₁) is the MLE
    * bigram probability c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) and P(wᵢ) the corpus unigram.
    * The unigram back-off keeps every observed bigram's mixture strictly
    * positive, so no extra smoothing floor is needed; word order now
    * matters — a shuffled document scores like its unigram baseline, a
    * fluent one above it.
    *
    * Determinism: counts are exact longs shared with the oracle; the
    * mixture is ONE fixed IEEE parenthesization into ln (the pinned libm
    * assumption), and the per-document reduction is an ExactSum of
    * quantized k·ln(mix) terms — order-independent, engine-exact.
    *
    * Scale design (100 TB): one corpus pass builds the (doc, bigram)
    * multiplicities (map-side combined like q_word_freq); the bigram and
    * unigram models re-aggregate from vocabulary-sized frames and join
    * back on the bigram/word keys — AQE broadcasts them while they fit
    * and falls back to shuffle equi-joins at web-scale vocabularies; the
    * total is a 1-row broadcast. A production variant caps the bigram
    * table at top-V with the unigram floor as OOV mass; uncapped keeps
    * this oracle-exact. */
  val qBigramLm: Q = Q(
    "q_bigram_lm",
    """WITH t AS (SELECT doc_id,
                         regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                  FROM documents),
       u AS (SELECT unnest(toks) AS w FROM t),
       uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
       n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u),
       b AS (SELECT doc_id,
                    unnest(list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1])) AS bg
             FROM t WHERE len(toks) >= 2),
       gb AS (SELECT doc_id, bg, count(*) AS k FROM b GROUP BY 1, 2),
       bc AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
       sc AS (SELECT gb.doc_id,
                     CAST(sum(gb.k) AS INTEGER) AS n_bigrams,
                     CAST(sum(CAST(floor(gb.k *
                       ln(0.5 * (CAST(bc.cb AS DOUBLE) / CAST(ca.c AS DOUBLE))
                        + 0.5 * (CAST(cw.c AS DOUBLE) / n.n))
                       * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824
                       AS lsum
              FROM gb JOIN bc USING (bg)
              JOIN uc ca ON ca.w = split_part(gb.bg, ' ', 1)
              JOIN uc cw ON cw.w = split_part(gb.bg, ' ', 2)
              CROSS JOIN n
              GROUP BY gb.doc_id)
       SELECT doc_id, n_bigrams, round(lsum / n_bigrams, 4) AS avg_logprob
       FROM sc ORDER BY doc_id""") { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), tokens(lower(col("text"))).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(count(lit(1)).cast("double").as("n"))
    val b = base.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat(element_at(col("toks"), i), lit(" "),
          element_at(col("toks"), i + 1)))).as("bg"))
    val gb = b.groupBy("doc_id", "bg").agg(count(lit(1)).as("k"))
    val bc = b.groupBy("bg").agg(count(lit(1)).as("cb"))
    val mix = log(lit(0.5) * (col("cb").cast("double") / col("ca").cast("double"))
      + lit(0.5) * (col("cw").cast("double") / col("n")))
    gb.join(bc, "bg")
      .join(broadcast(uc.select(col("w").as("wa"), col("c").as("ca"))),
        split_part(col("bg"), lit(" "), lit(1)) === col("wa"))
      .join(broadcast(uc.select(col("w").as("wb"), col("c").as("cw"))),
        split_part(col("bg"), lit(" "), lit(2)) === col("wb"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(sum("k").cast("int").as("n_bigrams"),
        ExactSum.qsum(col("k") * mix).as("ls"))
      .select(col("doc_id"), col("n_bigrams"),
        round(ExactSum.value(col("ls")) / col("n_bigrams"), 4)
          .as("avg_logprob"))
      .orderBy("doc_id")
  }

  /** Duplicate-n-gram fraction (the RefinedWeb / Gopher repetition filter's
    * CORPUS-level sibling of q_repetition_profile's within-doc one): for
    * each document, the share of its distinct word-3-gram shingles that
    * also occur in at least one OTHER document (corpus document-frequency
    * ≥ 2). High values mark boilerplate, templates and near-dup residue
    * that survived exact dedup — the standard "cheap memorization risk"
    * signal a curation pipeline thresholds on before training.
    *
    * Scale design (100 TB): the shingle explode collapses map-side into
    * the distinct (doc, shingle) frame; df is the vocab-sized aggregate of
    * it (the q_word_freq shape); the join back shuffles on the shingle key
    * once and the per-doc fraction is a map-side-combinable count pair.
    * Linear end to end, no pair joins, no windows — this is the filter you
    * can afford on every document where the pair-listing forms
    * (q_ngram_jaccard / q_prefix_jaccard) are reporting tools. The
    * fraction is an integer ratio (ExactSum.intRatio) — no float anywhere. */
  val qDupNgramFraction: Q = Q(
    "q_dup_ngram_fraction",
    """WITH sh AS (
         SELECT DISTINCT doc_id, shingle FROM (
           SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
           FROM (SELECT doc_id,
                        regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                 FROM documents))),
       df AS (SELECT shingle, count(*) AS c FROM sh GROUP BY shingle),
       agg AS (SELECT doc_id, count(*) AS n,
                      sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS dup
               FROM sh JOIN df USING (shingle) GROUP BY doc_id)
       SELECT doc_id, CAST(n AS INTEGER) AS n_shingles,
              CAST((20000 * dup + n) // (2 * n) AS DOUBLE) / 10000
                AS dup_fraction
       FROM agg ORDER BY doc_id""") { (s, d) =>
    val sh = Tables.documents(s, d).select(col("doc_id"),
      explode(Dedup.shingles(col("text"))).as("shingle"))
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("c"))
    sh.join(dfreq, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("dup"))
      .select(col("doc_id"), col("n").cast("int").as("n_shingles"),
        ExactSum.intRatio(col("dup"), col("n"), 4).as("dup_fraction"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(
    qTextStats, qTextQuality, qLangGuess, qFingerprint, qWinnowFingerprint,
    qWordFreq, qCharEntropy, qRepetitionProfile, qUnigramLogprob,
    qSourceDivergence, qBpeMerges, qBm25Search, qBpeEncode, qBigramLm,
    qDupNgramFraction)
}
