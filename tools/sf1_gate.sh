#!/usr/bin/env bash
# Standing sf1 gate (VERDICT r4 #3, extended r6 with the standing probes
# of VERDICT r5 #4/#5/#6/#8): the full-oracle correctness gate, the ANN +
# adversarial-minhash recall pins, the vectorized-COW-read ratio pin, the
# multi-JVM object-store chaos gate, AND the bench — all at 10x the
# driver's verification scale. Run each round; record the bench line and
# probe JSON in BASELINE.md.
#
# Uses the compiled classes directly (no sbt lock) so it can run beside
# an interactive sbt session — but run `sbt compile; sbt Test/compile`
# first and do NOT run sbt while this is in flight.
#
# Usage: tools/sf1_gate.sh [corpus-dir] [out-dir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/sf1}
OUT=${2:-/tmp/verify_sf1}

# regenerate when the generator is newer than the corpus: r6 made half the
# document replicas perturbed near-dups (adversarial dedup corpus)
if [ ! -f "$SF1/lineitem.parquet" ] || \
   [ tools/make_sf1.py -nt "$SF1/documents.parquet" ]; then
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
TCP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
JFLAGS="-Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"

echo "== sf1 oracle gate =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$CP" graft.Verify "$SF1" "$OUT"
python3 tools/check_oracle.py "$SF1" "$OUT"

echo "== ln/exp margin audit (output safety >= 1000x at sf1) =="
python3 tools/margin_audit.py "$SF1" /tmp/margins_sf1.json > /dev/null

echo "== ANN recall pins at sf1 (LSH/IVF >= 0.9, quantized >= 0.8) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$TCP" graft.RecallProbe "$SF1" \
  | tee /tmp/recall_sf1.json

echo "== adversarial minhash recall + candidate-volume pin =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$CP" graft.operators.DedupRecallProbe "$SF1" \
  | grep '{"probe"' | tee /tmp/dedup_recall_sf1.json

echo "== incremental near-dup ingest: online recall + candidate pin (r8) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$CP" graft.operators.NearDupIngestProbe "$SF1" \
  | grep '{"probe"' | tee /tmp/neardup_ingest_sf1.json

echo "== incremental semantic ingest: drop recall vs global SemDeDup (r9) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$CP" graft.operators.SemanticIngestProbe "$SF1" \
  | grep '{"probe"' | tee /tmp/semantic_ingest_sf1.json

echo "== frame-sized retraction: million-key equality-delete path (r9) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$CP" graft.operators.RetractionProbe \
  | grep '{"probe"' | tee /tmp/retraction_sf1.json

echo "== BPE trainer at real merge counts: k=1024 driver-side (r9) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$TCP" graft.BpeScaleProbe "$SF1" \
  | grep '{"probe"' | tee /tmp/bpe_scale_sf1.json

echo "== vectorized COW-read ratio pin (>= 1.3x row path) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$TCP" graft.CowReadGate "$SF1" \
  | grep '{"probe"' | tee /tmp/cow_read_sf1.json

echo "== multi-JVM object-store chaos gate (kill -9, zero lost commits) =="
# shellcheck disable=SC2086
java $ADD_OPENS $JFLAGS -cp "$TCP" graft.ChaosGate "$SF1" \
  | grep '{"probe"' | tee /tmp/chaos_sf1.json

echo "== sf1 bench (runs=2 agg=min; run on an otherwise idle box) =="
# shellcheck disable=SC2086
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_full.json \
  java $ADD_OPENS $JFLAGS -cp "$CP" graft.Bench \
  | grep '{"metric"' | tee /tmp/bench_sf1.json

echo "== ingest pass2/pass1 flatness (<= 2x; r9's 232s pass2 class) =="
python3 tools/check_pass_flatness.py /tmp/bench_sf1_full.json

echo "== standing sf10 spot-probe (ratio <= 8x for 10x data; r8) =="
tools/sf10_probe.sh "$SF1" /tmp/sf10
