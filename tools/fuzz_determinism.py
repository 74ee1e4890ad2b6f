#!/usr/bin/env python3
"""Determinism fuzz gate (VERDICT r5 item 2).

Runs graft.Verify over the whole oracle suite under several
(cores, shuffle-partitions) configurations, canonicalizes each query's
dump (sort columns by name, sort rows), and asserts the VALUES are
byte-identical across every run. A query whose output depends on
partial-aggregate merge order (the q_importance_weights r5 flake class)
flips here long before it flips in the driver's single-shot gate.

Usage: python3 tools/fuzz_determinism.py <sfDir> [workDir]
Exit 0 = no flips; exit 1 = at least one query produced >1 distinct
canonical hash, listed with the differing configs.
"""
import hashlib
import os
import subprocess
import sys
import glob
import json

import pandas as pd

# (cores, shuffle partitions): prime/odd partition counts deliberately
# misaligned with core counts so row->partition placement, task count and
# merge arity all differ between runs.
CONFIGS = [(4, 4), (16, 7), (32, 13), (8, 32)]

ADD_OPENS = [f"--add-opens=java.base/{m}=ALL-UNNAMED" for m in [
    "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
    "java.net", "java.nio", "java.util", "java.util.concurrent",
    "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
    "sun.security.action", "sun.util.calendar"]]


def canon_hash(qdir: str) -> str:
    files = sorted(glob.glob(f"{qdir}/*.parquet"))
    if not files:
        return "MISSING"
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # Hash the exact printed values (full repr — floats at full precision,
    # so even a sub-rounding ulp drift between configs is a flip).
    h = hashlib.sha256()
    h.update(",".join(df.columns).encode())
    for row in df.itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()[:16]


def main(sf_dir: str, work: str) -> int:
    os.makedirs(work, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cp = f"{repo}/target/scala-2.13/classes:/opt/spark/jars/*"
    runs = {}
    for cores, shuf in CONFIGS:
        out = f"{work}/c{cores}_p{shuf}"
        env = dict(os.environ,
                   SPARK_GRAFT_CPUS=str(cores),
                   SPARK_GRAFT_SHUFFLE=str(shuf))
        print(f"== verify run: local[{cores}], shuffle.partitions={shuf} ==",
              flush=True)
        subprocess.run(
            ["java", *ADD_OPENS, "-Xmx16g", "-Dspark.ui.enabled=false",
             "-Dspark.sql.session.timeZone=UTC",
             "-cp", cp, "graft.Verify", sf_dir, out],
            check=True, env=env)
        runs[(cores, shuf)] = {
            os.path.basename(d): canon_hash(d)
            for d in sorted(glob.glob(f"{out}/q*")) if os.path.isdir(d)}
    names = sorted({n for r in runs.values() for n in r})
    flips = {}
    for n in names:
        seen = {}
        for cfg, r in runs.items():
            seen.setdefault(r.get(n, "ABSENT"), []).append(cfg)
        if len(seen) > 1:
            flips[n] = {h: cfgs for h, cfgs in seen.items()}
    print(f"\n{len(names)} queries x {len(CONFIGS)} configs")
    if flips:
        for n, detail in flips.items():
            print(f"FLIP {n}:")
            for h, cfgs in detail.items():
                print(f"  {h}  {cfgs}")
        print(f"\n{len(flips)} queries flipped")
        with open(f"{work}/flips.json", "w") as f:
            json.dump({n: {h: [list(c) for c in cfgs]
                           for h, cfgs in d.items()}
                       for n, d in flips.items()}, f, indent=1)
        return 1
    print("all queries byte-identical across configs")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1],
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzz_det"))
