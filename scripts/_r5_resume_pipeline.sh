#!/usr/bin/env bash
# Ephemeral round-5 driver: finish stage 1 under the RSS watchdog, pick
# the best VAE checkpoint, then run stage 2 under the same watchdog.
# Mirrors scripts/retrain_r5.sh stages 1-2 with guarded execution
# (scripts/train_guard.sh) after the stage-1 host-OOM kill.
set -euo pipefail
cd "$(dirname "$0")/.."

VAE_NAME=${VAE_NAME:-r5vae}
VAE_STEPS=${VAE_STEPS:-3200}
DIFF_STEPS=${DIFF_STEPS:-4000}
SEED=${SEED:-5}
RSS_GB=${RSS_GB:-80}

bash scripts/train_guard.sh "$RSS_GB" "$VAE_STEPS" "$VAE_NAME" --

VAE_RUN=$(ls -dt logs/*"$VAE_NAME" | head -1)
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

exec bash scripts/train_guard.sh "$RSS_GB" "$DIFF_STEPS" r5diff -- \
  -b configs/mug/mug_diffusion_tpu.yaml -t \
  -n r5diff -s "$SEED" \
  "model.params.first_stage_config.params.ckpt_path=$BEST_VAE" \
  lightning.trainer.val_every_n_epochs=10 \
  lightning.trainer.save_last_every_n_epochs=10 \
  lightning.trainer.device_audio_cache=true \
  lightning.trainer.device_audio_cache_mb=1024 \
  lightning.trainer.async_checkpoint=true \
  lightning.trainer.save_top_k=2
