#!/usr/bin/env bash
# Ephemeral round-5 helper: wait for the stage-1 VAE pid to exit, pick its
# best checkpoint, and launch the stage-2 diffusion retrain immediately so
# the TPU never idles between stages. Mirrors scripts/retrain_r5.sh stage 2.
set -euo pipefail
cd "$(dirname "$0")/.."

VAE_PID=$1
VAE_RUN=$2
SEED=${SEED:-5}
DIFF_STEPS=${DIFF_STEPS:-4000}

while kill -0 "$VAE_PID" 2>/dev/null; do sleep 30; done
sleep 10  # let the final checkpoint finish writing

BEST_VAE=$(python - "$VAE_RUN" <<'EOF'
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
echo "stage-1 best VAE checkpoint: $BEST_VAE"

exec python main.py -b configs/mug/mug_diffusion_tpu.yaml -t \
  -n r5diff -s "$SEED" --max_steps "$DIFF_STEPS" \
  "model.params.first_stage_config.params.ckpt_path=$BEST_VAE" \
  lightning.trainer.val_every_n_epochs=10 \
  lightning.trainer.device_audio_cache=true \
  lightning.trainer.save_top_k=2
