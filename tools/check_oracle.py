#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB over views of the
sfDir parquet tables, load the Spark parquet dump, sort columns by name,
sort rows, and compare values (exact for strings/ints, tight tolerance
report for floats so rounding-boundary risks surface early).

Per-twin wall telemetry (VERDICT r10 #5): every query line carries its
DuckDB wall; the full map is written to <outDir>/oracle_walls.json so the
gate log records where the verification tail goes. A twin whose wall
exceeds ORACLE_TWIN_CAP_SEC (default 900) gets a loud OVER-CAP line —
the policy response is to move it to sf0.01-full + sf1-accounting-only
via ORACLE_SKIP (a regex of query names to skip, recorded as skipped in
the walls file rather than silently dropped).
"""
import json, os, re, sys, glob, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    cap = float(os.environ.get("ORACLE_TWIN_CAP_SEC", "900"))
    skip_pat = os.environ.get("ORACLE_SKIP")
    skip_re = re.compile(skip_pat) if skip_pat else None
    walls, over_cap = {}, []
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if skip_re and skip_re.fullmatch(name):
            print(f"SKIP {name} (ORACLE_SKIP={skip_pat})")
            walls[name] = {"oracle_sec": None, "skipped": True}
            n_skip += 1
            continue
        t0 = time.perf_counter()
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        wall = time.perf_counter() - t0
        walls[name] = {"oracle_sec": round(wall, 2)}
        if wall > cap:
            over_cap.append(name)
            print(f"ORACLE TWIN OVER CAP: {name} took {wall:.0f}s > {cap:.0f}s "
                  f"— move it to sf0.01-full + sf1-accounting-only (ORACLE_SKIP)")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        ok = True
        for c in g.columns:
            gc, ec = g[c], e[c]
            if pd.api.types.is_float_dtype(gc) or pd.api.types.is_float_dtype(ec):
                diff = (gc.astype(float) - ec.astype(float)).abs()
                bad = diff[diff > 1e-9]
                if len(bad):
                    print(f"FAIL {name}: col {c}: {len(bad)} float diffs, max {bad.max()}")
                    ok = False
            else:
                neq = (gc.astype(str) != ec.astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"FAIL {name}: col {c}: {neq.sum()} diffs, first at row {i}: spark={gc[i]!r} oracle={ec[i]!r}")
                    ok = False
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, oracle {wall:.1f}s)")
        else:
            n_fail += 1
    with open(f"{out_dir}/oracle_walls.json", "w") as f:
        json.dump({"cap_sec": cap, "over_cap": over_cap, "walls": walls}, f,
                  indent=1, sort_keys=True)
    slow = sorted(((w["oracle_sec"], q) for q, w in walls.items()
                   if w.get("oracle_sec")), reverse=True)[:10]
    print("\nslowest oracle twins: " +
          ", ".join(f"{q}={t:.0f}s" for t, q in slow))
    if over_cap:
        print(f"OVER-CAP TWINS ({cap:.0f}s): {', '.join(over_cap)}")
    skipped = f", {n_skip} skipped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}, "
          f"{len(oracle)} total oracle queries")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
