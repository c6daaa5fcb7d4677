#!/usr/bin/env bash
# One-command round-5 retrain recipe (VERDICT r4 item 5: make the trained
# evidence reproducible from a fresh clone).
#
#   bash scripts/retrain_r5.sh
#
# Stages (the reference's two-stage recipe, ref README.md:57-63):
#   0. corpus v2: LN-bearing, pattern-family synthetic dataset + feature.db
#   1. first-stage VAE  (configs/mug/autoencoder_tpu.yaml)
#   2. latent diffusion (configs/mug/mug_diffusion_tpu.yaml) with the
#      stage-1 best checkpoint frozen-restored via
#      model.params.first_stage_config.params.ckpt_path
#
# Environment knobs: CORPUS_N (default 768 charts), SEED (5),
# VAE_STEPS (6000), DIFF_STEPS (4000), OUT (runs prefix r5).
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS_N=${CORPUS_N:-768}
SEED=${SEED:-5}
VAE_STEPS=${VAE_STEPS:-6000}
DIFF_STEPS=${DIFF_STEPS:-4000}
OUT=${OUT:-r5}

# ---- 0. corpus --------------------------------------------------------
if [ ! -f data/synthetic/beatmap.txt ] || \
   [ "$(wc -l < data/synthetic/beatmap.txt)" -ne "$CORPUS_N" ]; then
  python scripts/make_synthetic_dataset.py \
    -o data/synthetic -n "$CORPUS_N" --seed "$SEED"
fi
# the training configs read data/beatmap.txt
cp data/synthetic/beatmap.txt data/beatmap.txt

# ---- 1. VAE -----------------------------------------------------------
# plateau_patience is in VALIDATIONS; with ~3.5-step epochs the torch
# default (10) fires after ~35 stagnant steps and kills the LR before the
# sparse rice-start plane takes off. val every 8 epochs + patience 20
# = ~480 stagnant steps before a cut. Sparse save_last + async orbax:
# on a tunnel host the default every-epoch full-state readback dominates
# wall clock 6x over compute (docs/PERF.md round-5 training note).
python main.py -b configs/mug/autoencoder_tpu.yaml -t \
  -n "${OUT}vae" -s "$SEED" --max_steps "$VAE_STEPS" \
  model.params.plateau_patience=20 \
  lightning.trainer.val_every_n_epochs=8 \
  lightning.trainer.save_last_every_n_epochs=32 \
  lightning.trainer.async_checkpoint=true

# best checkpoint = smallest monitor value in the run's top-k dir
VAE_RUN=$(ls -dt logs/*"${OUT}vae"* | head -1)
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

# ---- 2. latent diffusion ---------------------------------------------
# val every 10 epochs (quality-gate ancestral probes every 5th val);
# device-resident mel cache cuts the dominant H2D transfer on remote hosts
# cache budget 1024 MB (not the 4096 default): a 768-chart fp16 mel corpus
# is ~6.3 GB, so the cache pins its whole budget. At 4 GiB the run died at
# the first full-state checkpoint readback; at 2.5 GiB it died at the first
# validation (fresh val executable + cache didn't fit — the axon tunnel
# chip exposes no memory_stats, and its free HBM is evidently far below
# the nominal 16 GB). ~1 GiB matches the only fill level that has ever
# completed a full stage-2 run (r4). The trainer additionally clears the
# cache before every validation and re-dispatches on RESOURCE_EXHAUSTED.
# save_last every 10 epochs: each 'last' is a ~1.6 GB tunnel readback.
python main.py -b configs/mug/mug_diffusion_tpu.yaml -t \
  -n "${OUT}diff" -s "$SEED" --max_steps "$DIFF_STEPS" \
  "model.params.first_stage_config.params.ckpt_path=$BEST_VAE" \
  lightning.trainer.val_every_n_epochs=10 \
  lightning.trainer.device_audio_cache=true \
  lightning.trainer.device_audio_cache_mb=1024 \
  lightning.trainer.save_last_every_n_epochs=10 \
  lightning.trainer.async_checkpoint=true \
  lightning.trainer.save_top_k=2

DIFF_RUN=$(ls -dt logs/*"${OUT}diff"* | head -1)
BEST_DIFF=$(python - "$DIFF_RUN" <<'EOF'
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
echo "stage-2 best diffusion checkpoint: $BEST_DIFF"
echo "metrics: $VAE_RUN/metrics.csv  $DIFF_RUN/metrics.csv"
echo
echo "eval next:"
echo "  python scripts/eval_solvers_quality.py --ckpt $BEST_DIFF"
echo "  python scripts/eval_controllability.py --ckpt $BEST_DIFF"
