#!/usr/bin/env python3
"""Margin audit for every ln/exp-bearing oracle (VERDICT r6 #2).

The two driver-reds of r5/r6 shared one mechanism: a transcendental value
(ln) computed independently by both engines reached the hashed output
bytes, and a sub-ulp libm disagreement near a quantize/round boundary
flipped a digit. r7 removed that dependence from the two red queries;
this tool measures how far every REMAINING ln/exp-bearing oracle sits
from the same cliff, so a sub-margin query is converted BEFORE it becomes
the next round's driver-red.

Two levels, because term margins alone mis-predict:

1. TERM margins — for every quantized term floor(v*S + 0.5), the distance
   of v*S + 0.5 to its nearest integer, in ulps of v*S. With ~10^5 terms
   the MINIMUM is expected at ~1 ulp (uniform order statistics), so "some
   term is near a boundary" is the normal state, not a defect: a flipped
   term only moves the final sum by 1/S.

2. OUTPUT margins — what actually flips a driver row: for each output
   value round(x, d), the slack (distance of x to its nearest rounding
   boundary) measured against the worst-case perturbation if every
   AT-RISK term (within 64 ulps of its flip boundary — 32x any real libm
   disagreement) flipped simultaneously, plus 64-ulp shifts of any
   transcendental that enters x directly (unquantized). The gate asserts
   slack >= 1000x that perturbation (or zero at-risk terms) per row.

Usage: python3 tools/margin_audit.py [sfDir] [reportPath]
Exit 1 if any query's worst output safety < 1000.
"""
import json
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPORT = sys.argv[2] if len(sys.argv) > 2 else None

TABLES = ["documents", "embeddings"]

# distance of v*S + 0.5 to nearest integer, in ulps of v*S; exact-zero
# terms (ln(1) = 0 on every engine) are riskless
MARGIN = """CASE WHEN {v} = 0 THEN 1e18 ELSE
  abs(({v}) * {S} + 0.5 - round(({v}) * {S} + 0.5))
  / pow(2, floor(log2(abs(({v}) * {S}))) - 52) END"""

# slack of round(x, d): distance of |x| to the nearest half-grid boundary
SLACK = "abs(abs({x}) * 1e{d} - floor(abs({x}) * 1e{d}) - 0.5) / 1e{d}"

# 64 ulps of a double value (0 -> riskless)
ULP64 = "CASE WHEN {x} = 0 THEN 0 ELSE 64 * pow(2, floor(log2(abs({x}))) - 52) END"


def term_stats(con, terms_sql, group):
    """terms_sql must yield columns ({group}, v). Returns per-group
    (min_ulps, risky, n) plus corpus totals."""
    m = MARGIN.format(v="v", S="1073741824.0")
    q = f"""WITH terms AS ({terms_sql})
      SELECT {group} AS g, min({m}) AS min_ulps,
             sum(CASE WHEN {m} < 64 THEN 1 ELSE 0 END) AS risky,
             count(*) AS n
      FROM terms GROUP BY 1"""
    return con.execute(q).df()


def summarize(name, rows, report):
    """rows: list of dicts with keys slack, pert (absolute units of x)."""
    worst = min(
        (r["slack"] / r["pert"] if r["pert"] > 0 else math.inf for r in rows),
        default=math.inf)
    at_risk = sum(1 for r in rows if r["pert"] > 0)
    entry = {
        "query": name,
        "rows": len(rows),
        "rows_with_risky_terms": at_risk,
        "worst_output_safety": None if worst == math.inf else round(worst, 1),
        "pass": worst >= 1000,
    }
    report.append(entry)
    return entry


Q30 = 1.0 / 1073741824.0

TOKS = r"""SELECT doc_id,
       regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents"""


def audit_unigram(con, report, terms_report):
    terms = f"""WITH t AS ({TOKS}),
      u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      g AS (SELECT doc_id, tok, count(*) AS k FROM u GROUP BY 1, 2),
      f AS (SELECT tok, sum(k) AS c FROM g GROUP BY tok),
      n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM f)
      SELECT g.doc_id AS doc_id, g.k * ln(f.c / n.n) AS v
      FROM g JOIN f USING (tok) CROSS JOIN n"""
    tm = term_stats(con, terms, "doc_id")
    terms_report["q_unigram_logprob"] = {
        "n_terms": int(tm["n"].sum()),
        "min_term_ulps": float(tm["min_ulps"].min()),
        "risky64_terms": int(tm["risky"].sum()),
    }
    out = con.execute(f"""WITH t AS ({TOKS}),
      u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
      g AS (SELECT doc_id, tok, count(*) AS k FROM u GROUP BY 1, 2),
      f AS (SELECT tok, sum(k) AS c FROM g GROUP BY tok),
      n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM f),
      p AS (SELECT g.doc_id,
              CAST(sum(g.k) AS INTEGER) AS nk,
              CAST(sum(CAST(floor(g.k * ln(f.c / n.n) * 1073741824 + 0.5)
                            AS BIGINT)) AS DOUBLE) / 1073741824 AS lsum
            FROM g JOIN f USING (tok) CROSS JOIN n GROUP BY g.doc_id)
      SELECT doc_id, nk, lsum / nk AS avg,
             {SLACK.format(x='lsum / nk', d='4')} AS slack_avg,
             exp(-(lsum / nk)) AS ppl,
             {SLACK.format(x='exp(-(lsum / nk))', d='2')} AS slack_ppl,
             {ULP64.format(x='exp(-(lsum / nk))')} AS ulp64_ppl
      FROM p""").df()
    tmx = tm.set_index("g")
    rows_avg, rows_ppl = [], []
    for r in out.itertuples():
        risky = int(tmx.loc[r.doc_id, "risky"])
        pert_avg = risky * Q30 / r.nk
        rows_avg.append({"slack": r.slack_avg, "pert": pert_avg})
        # ppl = exp(-avg): d ppl = ppl * d avg, plus exp's own libm ulps
        rows_ppl.append({"slack": r.slack_ppl,
                         "pert": pert_avg * r.ppl + r.ulp64_ppl})
    summarize("q_unigram_logprob.avg_logprob", rows_avg, report)
    summarize("q_unigram_logprob.perplexity (= q_perplexity_buckets)",
              rows_ppl, report)


def audit_bigram(con, report, terms_report):
    pre = f"""WITH t AS ({TOKS}),
      u AS (SELECT unnest(toks) AS w FROM t),
      uc AS (SELECT w, count(*) AS c FROM u GROUP BY w),
      n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u),
      b AS (SELECT doc_id,
              unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) AS bg
            FROM t WHERE len(toks) >= 2),
      gb AS (SELECT doc_id, bg, count(*) AS k FROM b GROUP BY 1, 2),
      bc AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
      tv AS (SELECT gb.doc_id AS doc_id, gb.k AS k,
               gb.k * ln(0.5 * (CAST(bc.cb AS DOUBLE) / CAST(ca.c AS DOUBLE))
                       + 0.5 * (CAST(cw.c AS DOUBLE) / n.n)) AS v
             FROM gb JOIN bc USING (bg)
             JOIN uc ca ON ca.w = split_part(gb.bg, ' ', 1)
             JOIN uc cw ON cw.w = split_part(gb.bg, ' ', 2)
             CROSS JOIN n)"""
    tm = term_stats(con, pre + " SELECT doc_id, v FROM tv", "doc_id")
    terms_report["q_bigram_lm"] = {
        "n_terms": int(tm["n"].sum()),
        "min_term_ulps": float(tm["min_ulps"].min()),
        "risky64_terms": int(tm["risky"].sum()),
    }
    out = con.execute(pre + f""",
      sc AS (SELECT doc_id, CAST(sum(k) AS INTEGER) AS nb,
               CAST(sum(CAST(floor(v * 1073741824 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1073741824 AS lsum
             FROM tv GROUP BY doc_id)
      SELECT doc_id, nb, {SLACK.format(x='lsum / nb', d='4')} AS slack
      FROM sc""").df()
    tmx = tm.set_index("g")
    rows = [{"slack": r.slack,
             "pert": int(tmx.loc[r.doc_id, "risky"]) * Q30 / r.nb}
            for r in out.itertuples()]
    summarize("q_bigram_lm.avg_logprob", rows, report)


def audit_char_entropy(con, report, terms_report):
    pre = r"""WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
               FROM documents),
      f AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
      t AS (SELECT doc_id, sum(k) AS n FROM f GROUP BY 1),
      tv AS (SELECT f.doc_id AS doc_id,
               (f.k / CAST(t.n AS DOUBLE))
                 * (ln(f.k / CAST(t.n AS DOUBLE)) / ln(2)) AS v
             FROM f JOIN t USING (doc_id))"""
    tm = term_stats(con, pre + " SELECT doc_id, v FROM tv", "doc_id")
    terms_report["q_char_entropy"] = {
        "n_terms": int(tm["n"].sum()),
        "min_term_ulps": float(tm["min_ulps"].min()),
        "risky64_terms": int(tm["risky"].sum()),
    }
    out = con.execute(pre + f""",
      e AS (SELECT doc_id,
              -(CAST(sum(CAST(floor(v * 1073741824 + 0.5) AS BIGINT))
                     AS DOUBLE) / 1073741824) AS ent
            FROM tv GROUP BY doc_id)
      SELECT doc_id, {SLACK.format(x='ent', d='6')} AS slack FROM e""").df()
    tmx = tm.set_index("g")
    rows = [{"slack": r.slack,
             "pert": int(tmx.loc[r.doc_id, "risky"]) * Q30}
            for r in out.itertuples()]
    summarize("q_char_entropy.entropy", rows, report)


def audit_source_divergence(con, report, terms_report):
    pre = f"""WITH t0 AS ({TOKS}),
      u AS (SELECT d.source, unnest(t0.toks) AS tok
            FROM t0 JOIN documents d USING (doc_id)),
      sc AS (SELECT source, tok, count(*) AS c FROM u GROUP BY 1, 2),
      st AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
      g AS (SELECT tok, sum(c) AS gc FROM sc GROUP BY 1),
      gt AS (SELECT sum(gc) AS gn FROM g),
      tv AS (SELECT sc.source AS source,
               (sc.c / CAST(st.n AS DOUBLE))
                 * ln((sc.c / CAST(st.n AS DOUBLE))
                      / (g.gc / CAST(gt.gn AS DOUBLE))) AS v
             FROM sc JOIN st USING (source) JOIN g USING (tok)
             CROSS JOIN gt)"""
    tm = term_stats(con, pre + " SELECT source, v FROM tv", "source")
    terms_report["q_source_divergence"] = {
        "n_terms": int(tm["n"].sum()),
        "min_term_ulps": float(tm["min_ulps"].min()),
        "risky64_terms": int(tm["risky"].sum()),
    }
    out = con.execute(pre + f""",
      e AS (SELECT source,
              CAST(sum(CAST(floor(v * 1073741824 + 0.5) AS BIGINT))
                   AS DOUBLE) / 1073741824 AS kl
            FROM tv GROUP BY source)
      SELECT source, {SLACK.format(x='kl', d='4')} AS slack FROM e""").df()
    tmx = tm.set_index("g")
    rows = [{"slack": r.slack,
             "pert": int(tmx.loc[r.source, "risky"]) * Q30}
            for r in out.itertuples()]
    summarize("q_source_divergence.kl_from_corpus", rows, report)


def audit_quality_classifier(con, report, terms_report):
    pre = f"""WITH t AS (SELECT doc_id, source,
               regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
             FROM documents),
      lab AS (SELECT doc_id, toks, len(toks) AS n_toks,
                (source IN ('src0', 'src1', 'src2', 'src3')) AS pos,
                (doc_id % 5 <> 0) AS is_train FROM t),
      u AS (SELECT doc_id, pos, is_train, unnest(toks) AS tok FROM lab),
      g AS (SELECT doc_id, pos, is_train, tok, count(*) AS k
            FROM u GROUP BY 1, 2, 3, 4),
      m AS (SELECT tok,
              sum(CASE WHEN pos THEN k ELSE 0 END) AS cp,
              sum(CASE WHEN NOT pos THEN k ELSE 0 END) AS cn
            FROM g WHERE is_train GROUP BY tok),
      tv AS (SELECT g.doc_id AS doc_id,
               g.k * (ln(CAST(m.cp + 1 AS DOUBLE))
                    - ln(CAST(m.cn + 1 AS DOUBLE))) AS v
             FROM g JOIN m USING (tok) WHERE NOT g.is_train)"""
    tm = term_stats(con, pre + " SELECT doc_id, v FROM tv", "doc_id")
    terms_report["q_quality_classifier"] = {
        "n_terms": int(tm["n"].sum()),
        "min_term_ulps": float(tm["min_ulps"].min()),
        "risky64_terms": int(tm["risky"].sum()),
    }
    out = con.execute(pre + f""",
      c AS (SELECT CAST(sum(cp) AS DOUBLE) AS tp,
              CAST(sum(cn) AS DOUBLE) AS tn,
              CAST(count(*) AS DOUBLE) AS v FROM m),
      d AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) AS dp,
              CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS DOUBLE) AS dn
            FROM lab WHERE is_train AND n_toks >= 1),
      s AS (SELECT doc_id,
              CAST(sum(CAST(floor(v * 1073741824 + 0.5) AS BIGINT))
                   AS DOUBLE) / 1073741824 AS known
            FROM tv GROUP BY doc_id)
      SELECT l.doc_id AS doc_id, l.n_toks AS n_toks,
             ln(d.dp / d.dn) + coalesce(s.known, 0)
               + l.n_toks * ln((c.tn + c.v) / (c.tp + c.v)) AS logit,
             {SLACK.format(x=('ln(d.dp / d.dn) + coalesce(s.known, 0) '
                              '+ l.n_toks * ln((c.tn + c.v) / (c.tp + c.v))'), d='2')}
               AS slack,
             {ULP64.format(x='ln(d.dp / d.dn)')} AS u_prior,
             {ULP64.format(x='ln((c.tn + c.v) / (c.tp + c.v))')} AS u_unk
      FROM lab l LEFT JOIN s ON l.doc_id = s.doc_id
      CROSS JOIN c CROSS JOIN d
      WHERE NOT l.is_train AND l.n_toks >= 1""").df()
    tmx = tm.set_index("g")
    rows = []
    for r in out.itertuples():
        risky = int(tmx.loc[r.doc_id, "risky"]) if r.doc_id in tmx.index else 0
        # quantized-term flips + the two DIRECT (unquantized) ln terms
        rows.append({"slack": r.slack,
                     "pert": risky * Q30 + r.u_prior + r.n_toks * r.u_unk})
    summarize("q_quality_classifier.logit", rows, report)


def audit_zipf(con, report, terms_report):
    pre = f"""WITH t0 AS ({TOKS}),
      u AS (SELECT unnest(toks) AS tok FROM t0),
      f AS (SELECT tok, count(*) AS c FROM u WHERE tok <> '' GROUP BY tok),
      r AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk FROM f),
      xy AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
             FROM r)"""
    fams = {"x": "x", "y": "y", "xy": "x * y", "xx": "x * x"}
    risky = {}
    min_ulps = 1e18
    n_terms = 0
    for fam, expr in fams.items():
        tm = term_stats(
            con, pre + f" SELECT 1 AS g, {expr} AS v FROM xy", "g")
        risky[fam] = int(tm["risky"].sum())
        min_ulps = min(min_ulps, float(tm["min_ulps"].min()))
        n_terms += int(tm["n"].sum())
    terms_report["q_zipf_fit"] = {
        "n_terms": n_terms, "min_term_ulps": min_ulps,
        "risky64_terms": sum(risky.values()),
    }
    row = con.execute(pre + """
      SELECT CAST(count(*) AS DOUBLE) AS n,
        CAST(sum(CAST(floor(x * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sx,
        CAST(sum(CAST(floor(y * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sy,
        CAST(sum(CAST(floor(x * y * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sxy,
        CAST(sum(CAST(floor(x * x * 1073741824 + 0.5) AS BIGINT)) AS DOUBLE) / 1073741824 AS sxx
      FROM xy""").fetchone()
    n, sx, sy, sxy, sxx = row

    def fit(sx, sy, sxy, sxx):
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den
        return slope, (sy - slope * sx) / n

    slope0, inter0 = fit(sx, sy, sxy, sxx)
    # numeric sensitivity: perturb each quantized sum by its worst-case
    # +/- risky/2^30 and take the max excursion of slope/intercept
    d_slope = d_inter = 0.0
    for i, fam in enumerate(["x", "y", "xy", "xx"]):
        eps = risky[fam] * Q30
        for sign in (+1, -1):
            s = [sx, sy, sxy, sxx]
            s[i] += sign * eps
            sl, it = fit(*s)
            d_slope = max(d_slope, abs(sl - slope0))
            d_inter = max(d_inter, abs(it - inter0))

    def slack(x, d):
        y = abs(x) * 10 ** d
        return abs(y - math.floor(y) - 0.5) / 10 ** d

    summarize("q_zipf_fit.slope",
              [{"slack": slack(slope0, 4), "pert": d_slope}], report)
    summarize("q_zipf_fit.intercept",
              [{"slack": slack(inter0, 4), "pert": d_inter}], report)


def audit_tfidf(con, report, terms_report):
    out = con.execute(f"""WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
      df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents)
      SELECT tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS x,
             {SLACK.format(x='tf.tf * ln(CAST(n.n AS DOUBLE) / df.df)', d='4')} AS slack,
             tf.tf * {ULP64.format(x='ln(CAST(n.n AS DOUBLE) / df.df)')} AS pert
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE tf.tf >= 3""").df()
    terms_report["q_tfidf"] = {"n_terms": len(out),
                               "direct_ln": True}
    rows = [{"slack": r.slack, "pert": r.pert} for r in out.itertuples()]
    summarize("q_tfidf.tfidf", rows, report)


def audit_pmi(con, report, terms_report):
    out = con.execute(f"""WITH t AS (SELECT list_filter(
        regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '') AS toks
        FROM documents),
      u AS (SELECT unnest(toks) AS w FROM t),
      uc AS (SELECT w, count(*) AS cw FROM u GROUP BY w),
      n1 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM u),
      bg AS (SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS b FROM t),
      bc AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
      n2 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bg),
      p AS (SELECT ln(((CAST(bc.cb AS DOUBLE) * n1.n) * n1.n)
                 / ((n2.n * CAST(ca.cw AS DOUBLE)) * CAST(cb2.cw AS DOUBLE))) AS x
            FROM bc CROSS JOIN n1 CROSS JOIN n2
            JOIN uc ca ON ca.w = split_part(bc.b, ' ', 1)
            JOIN uc cb2 ON cb2.w = split_part(bc.b, ' ', 2)
            WHERE bc.cb >= 5)
      SELECT x, {SLACK.format(x='x', d='4')} AS slack,
             {ULP64.format(x='x')} AS pert
      FROM p""").df()
    terms_report["q_pmi_bigrams"] = {"n_terms": len(out), "direct_ln": True}
    rows = [{"slack": r.slack, "pert": r.pert} for r in out.itertuples()]
    summarize("q_pmi_bigrams.pmi", rows, report)


def audit_bm25(con, report, terms_report):
    # per row: slack of round(score, 4) vs the sum of each query term's
    # 64-ulp ln shift scaled by its BM25 multiplier (the ln enters the
    # score UNQUANTIZED). Rank ties break on doc_id, so rank stability
    # reduces to per-row round stability (q_hybrid_search inherits this).
    out = con.execute(f"""WITH t AS ({TOKS}),
      base AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dlen,
            CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS fv,
            CAST(len(list_filter(toks, x -> x = 'join')) AS DOUBLE) AS fj,
            CAST(len(list_filter(toks, x -> x = 'stream')) AS DOUBLE) AS fs
        FROM t),
      st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dlen) AS ad,
            sum(CASE WHEN fv > 0 THEN 1.0 ELSE 0.0 END) AS dv,
            sum(CASE WHEN fj > 0 THEN 1.0 ELSE 0.0 END) AS dj,
            sum(CASE WHEN fs > 0 THEN 1.0 ELSE 0.0 END) AS ds
        FROM base),
      sc AS (SELECT b.doc_id,
            CASE WHEN b.fv > 0 THEN ln((st.n - st.dv + 0.5) / (st.dv + 0.5) + 1)
              * b.fv * 2.2 / (b.fv + 1.2 * (0.25 + 0.75 * b.dlen / st.ad)) ELSE 0 END AS c1,
            CASE WHEN b.fv > 0 THEN {ULP64.format(x='ln((st.n - st.dv + 0.5) / (st.dv + 0.5) + 1)')}
              * b.fv * 2.2 / (b.fv + 1.2 * (0.25 + 0.75 * b.dlen / st.ad)) ELSE 0 END AS p1,
            CASE WHEN b.fj > 0 THEN ln((st.n - st.dj + 0.5) / (st.dj + 0.5) + 1)
              * b.fj * 2.2 / (b.fj + 1.2 * (0.25 + 0.75 * b.dlen / st.ad)) ELSE 0 END AS c2,
            CASE WHEN b.fj > 0 THEN {ULP64.format(x='ln((st.n - st.dj + 0.5) / (st.dj + 0.5) + 1)')}
              * b.fj * 2.2 / (b.fj + 1.2 * (0.25 + 0.75 * b.dlen / st.ad)) ELSE 0 END AS p2,
            CASE WHEN b.fs > 0 THEN ln((st.n - st.ds + 0.5) / (st.ds + 0.5) + 1)
              * b.fs * 2.2 / (b.fs + 1.2 * (0.25 + 0.75 * b.dlen / st.ad)) ELSE 0 END AS c3,
            CASE WHEN b.fs > 0 THEN {ULP64.format(x='ln((st.n - st.ds + 0.5) / (st.ds + 0.5) + 1)')}
              * b.fs * 2.2 / (b.fs + 1.2 * (0.25 + 0.75 * b.dlen / st.ad)) ELSE 0 END AS p3,
            (b.fv + b.fj + b.fs) AS hits
        FROM base b CROSS JOIN st)
      SELECT {SLACK.format(x='c1 + c2 + c3', d='4')} AS slack,
             p1 + p2 + p3 AS pert
      FROM sc WHERE hits > 0""").df()
    terms_report["q_bm25_search"] = {"n_terms": len(out), "direct_ln": True}
    rows = [{"slack": r.slack, "pert": r.pert} for r in out.itertuples()]
    summarize("q_bm25_search.bm25 (rank basis of q_hybrid_search)",
              rows, report)


def audit_importance_weights(con, report, terms_report):
    # r7 form: the ONLY transcendental is the once-quantized 256-entry
    # weight table at a 2^20 grid; everything downstream is integer
    m = MARGIN.format(v="lw", S="1048576.0")
    out = con.execute(f"""WITH t AS ({TOKS}),
      f AS (SELECT doc_id, substr(md5(feat), 1, 2) AS bucket FROM (
              SELECT doc_id,
                     unnest(list_concat(toks,
                            list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i + 1]))) AS feat
              FROM t)),
      g AS (SELECT doc_id, bucket, count(*) AS k, (doc_id % 20 = 0) AS is_tgt
            FROM f GROUP BY 1, 2, 4),
      tgt AS (SELECT bucket, sum(k) AS tc FROM g WHERE is_tgt GROUP BY 1),
      raw AS (SELECT bucket, sum(k) AS rc FROM g WHERE NOT is_tgt GROUP BY 1),
      h AS (SELECT coalesce(t.bucket, r.bucket) AS bucket, t.tc, r.rc
            FROM tgt t FULL JOIN raw r ON t.bucket = r.bucket),
      tot AS (SELECT CAST(sum(tc) AS DOUBLE) AS tn,
                     CAST(sum(rc) AS DOUBLE) AS rn FROM h),
      w AS (SELECT ln((coalesce(tc, 0) + 1) / (tn + 256.0))
                 - ln((coalesce(rc, 0) + 1) / (rn + 256.0)) AS lw
            FROM h CROSS JOIN tot)
      SELECT min({m}) AS min_ulps,
             sum(CASE WHEN {m} < 64 THEN 1 ELSE 0 END) AS risky,
             count(*) AS n
      FROM w""").fetchone()
    min_ulps, risky, n = out
    terms_report["q_importance_weights"] = {
        "n_terms": int(n), "min_term_ulps": float(min_ulps),
        "risky64_terms": int(risky),
        "note": "integer outputs; table-entry flips are the only exposure",
    }
    # a table-entry flip changes outputs outright, so the gate here is
    # simply zero risky entries (margins are huge: 256 entries on a 2^20
    # grid put the expected minimum at ~2^28/256 ulps)
    report.append({
        "query": "q_importance_weights.weight_table",
        "rows": int(n), "rows_with_risky_terms": int(risky),
        "worst_output_safety": None if risky == 0 else 0.0,
        "pass": int(risky) == 0,
    })


def audit_weighted_sample(con, report, terms_report):
    # ln survives only as the sort key; the audit is the ORDER margin:
    # min adjacent raw-key gap among ranks 1..201 (covers both the
    # within-sample order and the top-200 cut) vs 64 ulps of the keys
    out = con.execute("""WITH k AS (SELECT doc_id, n_chars,
        ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12))
                 AS BIGINT) + 1) / 281474976710656.0) / n_chars AS raw
        FROM documents WHERE n_chars > 0),
      r AS (SELECT raw, row_number() OVER (ORDER BY raw DESC, doc_id) AS rn
            FROM k)
      SELECT rn, raw, raw - lead(raw) OVER (ORDER BY rn) AS gap
      FROM r WHERE rn <= 201 ORDER BY rn""").df()
    gaps = out.dropna(subset=["gap"])
    rows = []
    for r in gaps.itertuples():
        u = 64 * 2 ** (math.floor(math.log2(abs(r.raw))) - 52) if r.raw != 0 else 0
        rows.append({"slack": r.gap, "pert": 2 * u})
    terms_report["q_weighted_sample"] = {
        "n_terms": len(rows),
        "note": "integer outputs; ln is sort-key-only — gap audit",
    }
    summarize("q_weighted_sample.order_gaps", rows, report)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    report, terms_report = [], {}
    audit_unigram(con, report, terms_report)
    audit_bigram(con, report, terms_report)
    audit_char_entropy(con, report, terms_report)
    audit_source_divergence(con, report, terms_report)
    audit_quality_classifier(con, report, terms_report)
    audit_zipf(con, report, terms_report)
    audit_tfidf(con, report, terms_report)
    audit_pmi(con, report, terms_report)
    audit_bm25(con, report, terms_report)
    audit_importance_weights(con, report, terms_report)
    audit_weighted_sample(con, report, terms_report)

    doc = {"sf": SF, "floor": 1000, "outputs": report, "terms": terms_report}
    print(json.dumps(doc, indent=2, default=str))
    if REPORT:
        with open(REPORT, "w") as f:
            json.dump(doc, f, indent=2, default=str)
    bad = [r for r in report if not r["pass"]]
    for r in bad:
        print(f"SUB-MARGIN: {r['query']} worst_safety="
              f"{r['worst_output_safety']}", file=sys.stderr)
    print(f"{len(report) - len(bad)}/{len(report)} output margins pass "
          f"(floor 1000x)", file=sys.stderr)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
