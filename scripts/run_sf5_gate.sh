#!/usr/bin/env bash
# sf5 FULL-SUITE oracle gate (r19): 50x the driver corpus, all-query Verify
# dump, DuckDB cell-compare with the sf2 playbook's budget escalation. Prior
# rounds certified sf5 only for the closure trio (r17) and the SemDeDup skew
# pair (r19 early); this runs the ENTIRE registry at 50x so the production
# scale story is oracle-certified, not extrapolated, one decade past sf1.
#
# Quadratic BASELINE rungs (d3/d7/d14/d16-class composite oracles) may
# exceed even the escalated budget in DuckDB at 50x — that cost measures the
# oracle engine, not this one; they are recorded oracle_timeout with the
# Spark row count kept (same semantics the sf2 gate documented).
#
# Usage: bash scripts/run_sf5_gate.sh   (from /root/repo; several hours)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 GenScale sf0.1 x50 -> testdata-sf5 =="
[ -d testdata-sf5 ] || sbt "runMain graft.GenScale /root/testdata/sf0.1 testdata-sf5 50"

echo "== 2/4 Verify dump at sf5 (full registry) =="
sbt "runMain graft.Verify testdata-sf5 verify_sf5"

echo "== 3/4 base compare (300s oracle budget) =="
python3 scripts/check_scaled.py testdata-sf5 verify_sf5 CORRECTNESS_SF5.json 300 || true

echo "== 4/4 escalation: re-judge oracle timeouts at 5400s =="
TIMEOUTS=$(python3 - <<'EOF'
import json
d = json.load(open("CORRECTNESS_SF5.json"))
print(",".join(sorted(n for n, r in d["queries"].items() if r.get("oracle_timeout"))))
EOF
)
if [ -n "$TIMEOUTS" ]; then
  echo "escalating: $TIMEOUTS"
  python3 scripts/check_scaled.py testdata-sf5 verify_sf5 CORRECTNESS_SF5.json 5400 "$TIMEOUTS"
else
  echo "no timeouts to escalate"
fi
python3 - <<'EOF'
import json
d = json.load(open("CORRECTNESS_SF5.json"))
print(f"SF5 GATE: {d['n_ok']} ok, {d['n_fail']} fail, {d['n_oracle_timeout']} timeout")
EOF
