#!/usr/bin/env bash
# Round-5 landing: gracefully stop the guarded retrain, pick the best
# stage-2 checkpoint, and produce the full post-training evidence suite
# (VERDICT r4 items 2/4/5/9) on the idle chip:
#
#   1. stop guard loop + trainer (SIGTERM checkpoints at a step boundary)
#   2. best ckpt = min monitor value among logs/*r5diff/checkpoints
#   3. compact it (params-only bf16) to runs/r5diff_best for in-repo
#      distribution (ref ships downloadable weights, ref README.md:57-63)
#   4. snapshot both stages' metrics.csv to docs/train_r5_*_metrics.csv
#   5. eval_solvers_quality  -> docs/solvers_r5.json   (item 9)
#   6. eval_controllability  -> docs/controllability_r5.json (item 2)
#   7. demo_inpaint          -> docs/inpaint_r5/       (item 4)
#
# Each eval is independent: a failure logs and moves on so one bad stage
# cannot sink the whole landing. Idempotent — safe to re-run on a later,
# better checkpoint. Does NOT commit; review docs/ output, then commit.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== 1. stopping guarded training (if live) ==="
stop_pid() {  # stop_pid <pidfile> <cmdline-substring> <signal>
  local f=$1 tag=$2 sig=$3 pid cmd
  [ -f "$f" ] || return 0
  pid=$(cat "$f") || return 0
  cmd=$(tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null) || return 0
  case "$cmd" in *"$tag"*) kill "-$sig" "$pid" 2>/dev/null || true;; esac
}
stop_pid /tmp/train_guard.pid train_guard KILL
stop_pid /tmp/pipeline.pid pipeline KILL
if [ -f /tmp/train_guard_child.pid ]; then
  PID=$(cat /tmp/train_guard_child.pid)
  if [ -r "/proc/$PID/cmdline" ] && \
     tr '\0' ' ' < "/proc/$PID/cmdline" | grep -q "main.py"; then
    kill -TERM "$PID" 2>/dev/null || true
    echo "landing trainer pid $PID (SIGTERM -> step-boundary checkpoint)"
    for _ in $(seq 120); do
      kill -0 "$PID" 2>/dev/null || break
      sleep 5
    done
    kill -KILL "$PID" 2>/dev/null || true
    sleep 10
  fi
fi

echo "=== 2. best stage-2 checkpoint ==="
DIFF_RUN=$(ls -dt logs/*r5diff 2>/dev/null | head -1)
BEST=$(python - "$DIFF_RUN" <<'EOF'
import os, re, sys
run = sys.argv[1]
ckpts = []
for name in os.listdir(os.path.join(run, "checkpoints")):
    m = re.match(r"epoch_(\d+)_m([0-9.]+)$", name)
    if m:
        ckpts.append((float(m.group(2)), name))
if not ckpts:
    raise SystemExit(f"no top-k checkpoints under {run}/checkpoints")
print(os.path.join(run, "checkpoints", min(ckpts)[1]))
EOF
)
echo "best: $BEST"

echo "=== 3. compact to runs/r5diff_best ==="
rm -rf runs/r5diff_best
python scripts/compact_checkpoint.py --in "$BEST" --out runs/r5diff_best \
  || echo "WARN: compaction failed"

echo "=== 4. metrics snapshots ==="
VAE_RUN=$(ls -dt logs/*r5vae 2>/dev/null | head -1)
[ -n "$VAE_RUN" ] && cp "$VAE_RUN/metrics.csv" docs/train_r5_vae_metrics.csv
[ -n "$DIFF_RUN" ] && cp "$DIFF_RUN/metrics.csv" docs/train_r5_diff_metrics.csv

AUDIO=data/synthetic/synth0000/audio.wav
CHART=data/synthetic/synth0000/chart.osu
CKPT=runs/r5diff_best
[ -d "$CKPT" ] || CKPT=$BEST

echo "=== 5. solver quality grid ==="
timeout 3600 python scripts/eval_solvers_quality.py --ckpt "$CKPT" \
  --audio "$AUDIO" > docs/solvers_r5.json 2> docs/solvers_r5.log \
  || echo "WARN: solver eval failed (docs/solvers_r5.log)"

echo "=== 6. prompt controllability grid ==="
timeout 5400 python scripts/eval_controllability.py --ckpt "$CKPT" \
  --out docs/controllability_r5.json > docs/controllability_r5.log 2>&1 \
  || echo "WARN: controllability eval failed (docs/controllability_r5.log)"

echo "=== 7. inpainting artifact demo ==="
timeout 1800 python scripts/demo_inpaint.py --ckpt "$CKPT" \
  --chart "$CHART" --audio "$AUDIO" --out docs/inpaint_r5 \
  > docs/inpaint_r5.log 2>&1 \
  || echo "WARN: inpaint demo failed (docs/inpaint_r5.log)"

echo "=== landing complete — review docs/ and commit ==="
