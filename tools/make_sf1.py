#!/usr/bin/env python3
"""Build the synthetic sf1 bench corpus: a 10x blow-up of sf0.1.

Recipe (BASELINE.md "Round-3 10x scale probe"): every fact-ish table is
replicated 10x with a per-replica key stride so keys stay unique and FK
joins stay consistent within a replica; dimension tables (region, nation)
are copied as-is; texts/embeddings are replicated VERBATIM, producing the
duplicate-heavy corpus that stresses the dedup/ANN pair operators the way
web-scale data does.

Usage: python3 tools/make_sf1.py [/root/testdata/sf0.1] [/tmp/sf1] [replicas]

An optional third argument sets the replica count (default 10) — e.g.
100 builds the sf10 probe corpus directly from sf0.1 (bands stay
disjoint: max replica stride 99e9 plus sf0.1 keys << 1e9).
"""
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
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def main():
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{DST}/{t}.parquet' (FORMAT parquet)")
        print(f"{t}: copied")
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
