#!/usr/bin/env bash
# Host-RAM watchdog + auto-resume loop around `main.py`.
#
# Long training runs through the axon TPU tunnel leak host memory
# (~1 GB/min; the round-5 stage-1 run was kernel-OOM-killed at 126 GB RSS
# after 107 min — see docs/PERF.md "host-RSS leak" note). Until the leak
# is pinned, training must be resilient to it: this wrapper polls the
# trainer's RSS, SIGTERMs it *gracefully* past a threshold (the trainer's
# SIGTERM handler defers to a step boundary and checkpoints — ref parity:
# Lightning's emergency checkpoint, ref main.py melk()), waits for the
# checkpoint to land, and relaunches with `-r` from `last`. A kernel
# OOM-kill (exit 137) is handled the same way: relaunch from `last`.
#
# Usage:
#   scripts/train_guard.sh RSS_GB MAX_STEPS NAME -- <first-launch args...>
#
# NAME is the run-name substring used to locate the run dir under logs/
# after the first launch (pass an existing run dir's basename to resume a
# prior run: the guard skips the first launch if logs/<...NAME> exists).
# Completion is judged from the run's metrics.csv step counter, not the
# child's exit code, so a graceful watchdog restart never ends the loop.
set -uo pipefail
cd "$(dirname "$0")/.."

RSS_GB=$1; MAX_STEPS=$2; NAME=$3; shift 3
[ "${1:-}" = "--" ] && shift

# advertise the guard loop's own PID so landing tooling (bench.py
# _ensure_idle_chip, scripts/_r5_land.sh) can stop the RELAUNCH LOOP by
# explicit pid — never by process-name pattern — before stopping the child
echo $$ > /tmp/train_guard.pid

last_step() {
  python - "$1" <<'EOF'
import csv, os, sys
path = os.path.join(sys.argv[1], "metrics.csv")
step = 0
if os.path.exists(path):
    for row in csv.DictReader(open(path)):
        s = row.get("step")
        if s:
            step = max(step, int(float(s)))
print(step)
EOF
}

run_dir() { ls -dt logs/*"$NAME" 2>/dev/null | head -1; }

LIMIT_KB=$((RSS_GB * 1024 * 1024))
FIRST=1
while true; do
  RD=$(run_dir)
  if [ -n "$RD" ] && [ "$(last_step "$RD")" -ge "$MAX_STEPS" ]; then
    echo "train_guard: $RD reached step >= $MAX_STEPS — done"
    break
  fi
  if [ -n "$RD" ]; then
    echo "train_guard: resuming $RD (step $(last_step "$RD")/$MAX_STEPS)"
    python main.py -r "$RD" -t --max_steps "$MAX_STEPS" &
  elif [ "$FIRST" -eq 1 ]; then
    echo "train_guard: first launch: main.py $*"
    python main.py "$@" --max_steps "$MAX_STEPS" &
  else
    echo "train_guard: no run dir matching *$NAME after first launch" >&2
    exit 1
  fi
  PID=$!
  FIRST=0
  echo "$PID" > /tmp/train_guard_child.pid
  while kill -0 "$PID" 2>/dev/null; do
    RSS_KB=$(awk '/VmRSS/{print $2}' "/proc/$PID/status" 2>/dev/null || echo 0)
    if [ "${RSS_KB:-0}" -gt "$LIMIT_KB" ]; then
      echo "train_guard: RSS ${RSS_KB} kB > ${RSS_GB} GB — graceful restart"
      kill -TERM "$PID" 2>/dev/null
      for _ in $(seq 120); do
        kill -0 "$PID" 2>/dev/null || break
        sleep 5
      done
      kill -KILL "$PID" 2>/dev/null
    fi
    sleep 20
  done
  wait "$PID"
  echo "train_guard: child exited rc=$? — rechecking progress"
  sleep 5
done
