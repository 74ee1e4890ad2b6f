#!/usr/bin/env python3
"""Per-ingest-query pass2/pass1 flatness gate (VERDICT r9 #8).

The r9 bench hid a state-accumulation regression inside min-of-2:
q_lake_ingest_neardup ran 53 s on pass1 and 232 s on pass2 (leaked
localCheckpoint blocks compounding across the run), and the reported
minimum looked merely "slow". Stateful ingest queries must now be FLAT
across passes: pass2 <= 2x pass1, asserted from the bench's full JSON
(pass1/pass2 maps). Sub-second walls are skipped (noise), and a
visibly-contended pass2 (steal share > 5%) downgrades violations to a
warning — contention is not state accumulation.

Usage: check_pass_flatness.py <bench_full.json> [query-regex]
Exit 2 on violation under clean-steal conditions.
"""
import json
import re
import sys

path = sys.argv[1]
pat = re.compile(sys.argv[2] if len(sys.argv) > 2 else r"^q_lake_ingest_")
d = json.load(open(path))
p1, p2 = d.get("pass1", {}), d.get("pass2", {})
steal2 = d.get("cpu_pass2", {}).get("steal_share", 0.0)
violations = []
for q, a in sorted(p1.items()):
    if not pat.match(q):
        continue
    b = p2.get(q, -1.0)
    if a <= 1.0 or b < 0:
        continue
    if b / a > 2.0:
        violations.append({"q": q, "pass1": a, "pass2": b,
                           "ratio": round(b / a, 2)})
print(json.dumps({"probe": "pass_flatness",
                  "steal_share_pass2": steal2,
                  "violations": violations}))
if violations and steal2 <= 0.05:
    sys.exit(2)
