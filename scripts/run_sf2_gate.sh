#!/usr/bin/env bash
# sf2 oracle gate (VERDICT r15 item 3): 20x the driver corpus, full
# 258-query Verify dump, DuckDB cell-compare with the pair-family budget
# escalation (quadratic-oracle rungs re-judged at a large budget instead of
# being recorded as timeouts).
#
# Usage: bash scripts/run_sf2_gate.sh   (from /root/repo; takes ~1-2h)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/4 GenScale sf0.1 x20 -> testdata-sf2 =="
[ -d testdata-sf2 ] || sbt "runMain graft.GenScale /root/testdata/sf0.1 testdata-sf2 20"

echo "== 2/4 Verify dump at sf2 =="
sbt "runMain graft.Verify testdata-sf2 verify_sf2"

echo "== 3/4 base compare (240s oracle budget) =="
python3 scripts/check_scaled.py testdata-sf2 verify_sf2 CORRECTNESS_SF2.json 240 || true

echo "== 4/4 escalation: re-judge oracle timeouts at 3600s =="
TIMEOUTS=$(python3 - <<'EOF'
import json
d = json.load(open("CORRECTNESS_SF2.json"))
print(",".join(sorted(n for n, r in d["queries"].items() if r.get("oracle_timeout"))))
EOF
)
if [ -n "$TIMEOUTS" ]; then
  echo "escalating: $TIMEOUTS"
  python3 scripts/check_scaled.py testdata-sf2 verify_sf2 CORRECTNESS_SF2.json 3600 "$TIMEOUTS"
else
  echo "no timeouts to escalate"
fi
python3 - <<'EOF'
import json
d = json.load(open("CORRECTNESS_SF2.json"))
print(f"SF2 GATE: {d['n_ok']} ok, {d['n_fail']} fail, {d['n_oracle_timeout']} timeout")
EOF
