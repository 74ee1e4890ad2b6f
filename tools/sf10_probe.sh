#!/usr/bin/env bash
# Standing 100x spot-probe (VERDICT r7 #3): every round, bench the
# heaviest/newest queries at sf1 AND sf10 (single pass each, heartbeat
# relief at sf10) and FAIL if any non-exempt query's wall ratio exceeds
# RATIO_MAX for 10x the data. The last three rounds each found a real
# cliff (Int8Quantize O(dim^2), decontam eval growth, the r7 naive edge
# builder) only when someone remembered to run this by hand — now the
# gate runs it. Record the printed table in BASELINE.md each round.
#
# FENCED OUT of the probe entirely (like q_substring_overlap): the two
# declared output-bound pair LISTINGS — q_ngram_jaccard (t=1/20: member
# pairs are quadratic in the adversarial replica count by definition) and
# q_substring_overlap. Their wall time IS their output size; production
# pipelines use the linear twins (prefix builder / best-match).
#
# Exemptions (measured, ratio not asserted):
#   q_dedup_pipeline   — exact J>=1/2 EDGE SET is quadratic in per-class
#                        duplication on this corpus (VERDICT r7: per-edge
#                        cost flat; the ratio tracks the edge count).
#
# Usage: tools/sf10_probe.sh [sf1-dir] [sf10-dir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/sf1}
SF10=${2:-/tmp/sf10}
RATIO_MAX=${RATIO_MAX:-8.0}
# run-scoped flagged-query list (ADVICE r8: a stale /tmp/probe_bad.txt from
# a previous run could feed the retry the WRONG query set if assert_ratios
# died before writing — e.g. on a truncated bench JSON)
BADFILE=$(mktemp /tmp/probe_bad.XXXXXX)
trap 'rm -f "$BADFILE"' EXIT
FILTER='^(q_snm_pairs|q_substring_best_match|q_knn_pq|q_knn_ivfpq|q_hybrid_search|q_minhash_dedup|q_minhash_dedup_small|q_embedding_clusters_small|q_retained_spans|q_lake_ingest_neardup|q_lake_ingest_neardup_small|q_lake_ingest_semantic|q_lake_ingest_media|q_dedup_groups_capped|q_importance_weights|q_dedup_pipeline)$'
EXEMPT='q_dedup_pipeline'

if [ ! -f "$SF10/lineitem.parquet" ] || \
   [ tools/make_sf1.py -nt "$SF10/documents.parquet" ]; then
  echo "== generating sf10 corpus at $SF10 =="
  python3 tools/make_sf1.py /root/testdata/sf0.1 "$SF10" 100
fi

ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED \
--add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED \
--add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# GRAFT_CP override: point at a snapshot of the classes dir to run the
# probe beside an active sbt session (half-recompiled classes in the live
# dir fail with spurious NoSuchMethodError)
CP="${GRAFT_CP:-target/scala-2.13/classes:/opt/spark/jars/*}"
JFLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
# sf10 aggregates push GC pauses past the 120 s heartbeat; relief required
RELIEF="-Dspark.executor.heartbeatInterval=60s -Dspark.network.timeout=600s"

echo "== sf10 spot-probe: sf1 single-pass baseline =="
# shellcheck disable=SC2086
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_FILTER="$FILTER" \
  SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_OUT=/tmp/probe_bench_sf1.json \
  java $ADD_OPENS -Xmx24g $JFLAGS -cp "$CP" graft.Bench > /dev/null

echo "== sf10 spot-probe: sf10 single-pass =="
# shellcheck disable=SC2086
SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_FILTER="$FILTER" \
  SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_OUT=/tmp/probe_bench_sf10.json \
  java $ADD_OPENS -Xmx48g $JFLAGS $RELIEF -cp "$CP" graft.Bench > /dev/null

assert_ratios() {
  # args: sf1-json sf10-json; prints the table, writes over-ratio /
  # errored queries to $BADFILE, exit 2 when any
  python3 - "$RATIO_MAX" "$EXEMPT" "$1" "$2" "$BADFILE" <<'EOF'
import json, sys
ratio_max = float(sys.argv[1])
exempt = set(sys.argv[2].split(","))
s1 = json.loads(open(sys.argv[3]).read())["result"]["queries"]
s10 = json.loads(open(sys.argv[4]).read())["result"]["queries"]
bad = []
print(f"{'query':32s} {'sf1':>8s} {'sf10':>9s} {'ratio':>7s}")
for q in sorted(s1):
    t1, t10 = s1[q], s10.get(q, -1.0)
    if t1 <= 0 or t10 <= 0:
        # errored/missing fails UNCONDITIONALLY — exemption covers only
        # the ratio cap, never crash detection (ADVICE r8)
        bad.append((q, "errored or missing"))
        print(f"{q:32s} {t1:8.1f} {t10:9.1f}   ERR")
        continue
    r = t10 / t1
    tag = " (exempt)" if q in exempt else ""
    print(f"{q:32s} {t1:8.1f} {t10:9.1f} {r:6.1f}x{tag}")
    if q not in exempt and r > ratio_max:
        bad.append((q, f"ratio {r:.1f}x > {ratio_max}x"))
with open(sys.argv[5], "w") as f:
    f.write("\n".join(q for q, _ in bad))
if bad:
    print("SF10 PROBE OVER-RATIO: " + "; ".join(f"{q}: {why}" for q, why in bad))
    sys.exit(2)
print("sf10 probe PASS")
EOF
}

if ! assert_ratios /tmp/probe_bench_sf1.json /tmp/probe_bench_sf10.json; then
  # Single-shot timings lie on this host (documented in BASELINE.md: the
  # r8 gate flagged q_hybrid_search at 22.5x from a cache-hot sf1
  # baseline against a GC-polluted sf10 pass; idle min-of-2 measured
  # 2.6x). Before failing the round, re-measure ONLY the flagged queries
  # min-of-2 at both scales and re-assert — the retry costs minutes and
  # only runs on a flag, so the common green path stays single-pass.
  # fail hard if the flagged list never materialized (assert_ratios died
  # before its write — e.g. unreadable bench JSON); retrying a stale or
  # empty list would re-measure the wrong queries and could pass wrongly
  [ -s "$BADFILE" ] || { echo "SF10 PROBE FAIL (no flagged-query list: assert_ratios crashed before writing)"; exit 2; }
  BAD=$(paste -sd'|' "$BADFILE")
  echo "== re-measuring flagged queries min-of-2: ($BAD) =="
  # shellcheck disable=SC2086
  SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_FILTER="^($BAD)$" \
    SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_OUT=/tmp/probe_retry_sf1.json \
    java $ADD_OPENS -Xmx24g $JFLAGS -cp "$CP" graft.Bench > /dev/null
  # shellcheck disable=SC2086
  SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_FILTER="^($BAD)$" \
    SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_OUT=/tmp/probe_retry_sf10.json \
    java $ADD_OPENS -Xmx48g $JFLAGS $RELIEF -cp "$CP" graft.Bench > /dev/null
  echo "== final verdict (flagged queries re-measured min-of-2) =="
  assert_ratios /tmp/probe_retry_sf1.json /tmp/probe_retry_sf10.json \
    || { echo "SF10 PROBE FAIL (confirmed on min-of-2)"; exit 2; }
fi
