#!/usr/bin/env bash
# Unattended round-5 closer: watch the live stage-2 retrain and trigger
# scripts/_r5_land.sh (graceful stop + post-training evidence suite) when
# EITHER
#   * the wall deadline passes (arg 1, epoch seconds) — leaves time for
#     the landing evals + an idle-chip bench before the round closes, OR
#   * val/loss has not improved by >0.1% for PLATEAU consecutive
#     validations (default 12 — ~2 h at the current cadence),
# then commits the produced evidence. Idempotent: exits if a landing
# marker exists.
set -uo pipefail
cd "$(dirname "$0")/.."

DEADLINE=${1:?usage: _r5_watch_and_land.sh <deadline-epoch-seconds>}
PLATEAU=${PLATEAU:-5}
MARKER=/tmp/r5_landed

[ -f "$MARKER" ] && { echo "already landed"; exit 0; }

best=""
stale=0
seen=0
while true; do
  now=$(date +%s)
  reason=""
  if [ "$now" -ge "$DEADLINE" ]; then
    reason="deadline"
  else
    RD=$(ls -dt logs/*r5diff 2>/dev/null | head -1)
    if [ -n "$RD" ] && [ -f "$RD/metrics.csv" ]; then
      # "<n_validations> <last_val_loss>" — stale counts VALIDATIONS
      # without >0.1% improvement, not poll iterations
      read -r nval cur <<< "$(python3 - "$RD/metrics.csv" <<'EOF'
import csv, sys
vals = [float(r["val/loss"]) for r in csv.DictReader(open(sys.argv[1]))
        if r.get("val/loss")]
print(len(vals), f"{vals[-1]:.6f}" if vals else "")
EOF
)"
      if [ -n "$cur" ] && [ "${nval:-0}" -gt "${seen:-0}" ]; then
        seen=$nval
        if [ -z "$best" ] || python3 -c "import sys; sys.exit(0 if float('$cur') < float('$best')*0.999 else 1)"; then
          best=$cur; stale=0
        else
          stale=$((stale + 1))
        fi
        echo "$(date -u +%H:%M) val#$nval val/loss=$cur best=$best stale=$stale/$PLATEAU"
        [ "$stale" -ge "$PLATEAU" ] && reason="plateau"
      fi
    fi
    # nothing left to watch: trainer and its guard both gone
    if [ -z "$reason" ] && ! kill -0 "$(cat /tmp/train_guard.pid 2>/dev/null || echo 0)" 2>/dev/null \
       && ! kill -0 "$(cat /tmp/train_guard_child.pid 2>/dev/null || echo 0)" 2>/dev/null; then
      reason="training-exited"
    fi
  fi
  if [ -n "$reason" ]; then
    echo "landing (reason: $reason)"
    # if the driver's bench is mid-measurement (it may have tripwired the
    # training itself), let it finish before the evals grab the chip
    while BP=$(cat /tmp/bench.pid 2>/dev/null) && [ -n "$BP" ] \
          && tr '\0' ' ' < "/proc/$BP/cmdline" 2>/dev/null | grep -q bench.py; do
      echo "waiting for live bench.py (pid $BP) to finish"
      sleep 30
    done
    touch "$MARKER"
    bash scripts/_r5_land.sh 2>&1 | tee /tmp/r5_land.log
    git add -A docs/ runs/ 2>/dev/null
    git commit -q -m "Round-5 trained evidence: metrics, solver/controllability/inpaint evals, compact checkpoint

Produced by scripts/_r5_land.sh after the two-stage corpus-v2 retrain
(landed on $reason). See docs/train_r5_*_metrics.csv,
docs/solvers_r5.json, docs/controllability_r5.json, docs/inpaint_r5/." \
      || echo "nothing to commit"
    exit 0
  fi
  sleep 120
done
