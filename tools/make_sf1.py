#!/usr/bin/env python3
"""Build the synthetic sf1 bench corpus: a 10x blow-up of sf0.1.

Recipe (BASELINE.md "Round-3 10x scale probe"): every fact-ish table is
replicated 10x with a per-replica key stride so keys stay unique and FK
joins stay consistent within a replica; dimension tables (region, nation)
are copied as-is; embeddings are replicated VERBATIM.

Documents (VERDICT r5 #5 — adversarial near-dup corpus): the FIRST HALF
of the replicas are verbatim copies (exact-dup pre-collapse stress, as
before); the SECOND HALF are PERTURBED — per-token mutations (delete /
swap-adjacent / duplicate) at a 1-4% rate, deterministic per
(doc_id, replica). Verbatim copies never stress the MinHash/LSH candidate
path (exact-dup pre-collapse eats them before banding); paraphrase-like
mutations exercise the banded join and the exact-Jaccard verify at real
candidate volumes. Ground truth is free: variants of one base doc share
doc_id % STRIDE, so tools/… recall probes can compute exact recall
without labels.

Usage: python3 tools/make_sf1.py [/root/testdata/sf0.1] [/tmp/sf1] [replicas]

An optional third argument sets the replica count (default 10) — e.g.
100 builds the sf10 probe corpus directly from sf0.1 (bands stay
disjoint: max replica stride 99e9 plus sf0.1 keys << 1e9).
"""
import random
import sys, os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
G = 1_000_000_000  # key stride per replica; >> any sf0.1 key

# per-table key columns that get the replica stride (FKs move together)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    # events.user_id joins customer.c_custkey (q_stream_enrich)
    "events": ["event_id", "user_id"],
    # documents handled by write_documents (perturbed replicas)
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def perturb(text: str, doc_id: int, r: int) -> str:
    """Paraphrase-like token mutation, deterministic per (doc_id, replica):
    each token independently deleted / swapped with its neighbor /
    duplicated at rate 1-4% (cycling with the replica index)."""
    rate = (1 + (r % 4)) / 100.0
    rng = random.Random(f"{doc_id}:{r}")
    toks = text.split(" ")
    out = []
    i = 0
    while i < len(toks):
        u = rng.random()
        if u < rate and len(toks) > 3:
            op = rng.randrange(3)
            if op == 0:            # delete
                i += 1
                continue
            if op == 1 and i + 1 < len(toks):  # swap adjacent
                out.append(toks[i + 1])
                out.append(toks[i])
                i += 2
                continue
            out.append(toks[i])    # duplicate
            out.append(toks[i])
            i += 1
            continue
        out.append(toks[i])
        i += 1
    return " ".join(out)


def write_documents(con):
    """Documents replicas: first half verbatim, second half perturbed."""
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{SRC}/documents.parquet') ORDER BY doc_id").fetchall()
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    verbatim = max(1, REPLICAS // 2)
    for r in range(REPLICAS):
        for doc_id, text, lang, source in rows:
            t = text if (r < verbatim or text is None) \
                else perturb(text, doc_id, r)
            out["doc_id"].append(doc_id + r * G)
            out["text"].append(t)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(t) if t is not None else None)
    import pandas as pd
    df = pd.DataFrame(out)
    con.register("docs_out", df)
    con.execute(f"COPY (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, "
                f"source, CAST(n_chars AS BIGINT) AS n_chars "
                f"FROM docs_out ORDER BY doc_id) "
                f"TO '{DST}/documents.parquet' (FORMAT parquet)")
    print(f"documents: {len(df)} rows "
          f"({verbatim} verbatim + {REPLICAS - verbatim} perturbed replicas)")


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")
    write_documents(con)
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')").fetchall()]
        selects = []
        for r in range(REPLICAS):
            proj = ", ".join(
                f"({c} + {r * G}) AS {c}" if c in keys else c for c in cols)
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{DST}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
