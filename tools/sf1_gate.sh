#!/usr/bin/env bash
# Standing sf1 gate (VERDICT r4 item 3): the 89-oracle correctness gate
# AND the bench at 10x the driver's verification scale. Run each round;
# record the bench line in BASELINE.md.
#
# Uses the compiled classes directly (no sbt lock) so it can run beside
# an interactive sbt session — but run `sbt compile` first.
#
# Usage: tools/sf1_gate.sh [corpus-dir] [out-dir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/sf1}
OUT=${2:-/tmp/verify_sf1}

if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "== generating sf1 corpus at $SF1 =="
  python3 tools/make_sf1.py /root/testdata/sf0.1 "$SF1"
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
CP="target/scala-2.13/classes:/opt/spark/jars/*"
JFLAGS="-Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

echo "== sf1 oracle gate =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$CP" graft.Verify "$SF1" "$OUT"
python3 tools/check_oracle.py "$SF1" "$OUT"

echo "== sf1 bench (runs=2 agg=min; run on an otherwise idle box) =="
# shellcheck disable=SC2086
SPARK_GRAFT_SF_DIR="$SF1" java $ADD_OPENS $JFLAGS -cp "$CP" graft.Bench \
  | grep '{"metric"' | tee /tmp/bench_sf1.json
