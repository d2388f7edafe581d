#!/bin/bash
# Round-5 final-session live validation of --anchor-ema-switch-drift
# (runs/driftlatch5).
#
# WHAT IT TESTS (BASELINE.md flagship findings 4-7): the rec13recipe5
# step-count gamma switch froze D's remaining bias the moment it fired
# mid-descent. The shipped fix latches the late gamma on the observable
# per-component drift ratio |EMA(delta)|/EMA(|delta|) instead, so no
# family still descending can be frozen. Unit tests prove the latch
# logic; THIS run observes it on the real chip in the regime that broke
# the flagship: J/S start AT truth (orbit-like motion from the first
# steps) while D starts -10% off and must DESCEND through the window
# where rec13recipe5's step switch would have fired.
#
# Pre-registered readout (before the run):
#   (a) gamma_late must NOT latch while D's families are still
#       directionally descending (drift_ratio ~1 on the D components);
#   (b) if/when D's descent stalls into the limit cycle, the ratio
#       falls and the latch may fire — firing LATE or NEVER is the safe
#       side (degenerates to gamma 0.995, which finding 7 showed tracks
#       truth), firing EARLY is the defect being fenced;
#   (c) drift_ratio is in learning.jsonl either way, so the threshold/
#       window tuning question gets its first real trace.
#
# Regime: pure-anchor (gen lr 1e-8 constant — the floored-adversarial
# regime of findings 6-7; critic keeps training as a witness). Rich
# (5,10,13) battery, flagship base config otherwise. ~0.46 s/step.
set -u
cd "$(dirname "$0")/../.."
RUN=${RUN:-driftlatch5}
N_STEPS=${N_STEPS:-4200}
mkdir -p runs
timeout -s TERM "${TIMEOUT_S:-2100}" python -u -m tcgan_tpu.run.gan \
  --datastore "runs/$RUN" --resume \
  --N 51 --batch-size 256 --n-steps "$N_STEPS" \
  --max-iter 8000 --atol 1e-4 \
  --J 0.045 0.04 0.05 0.035 \
  --D 0.09 0.072 0.09 0.072 \
  --S 0.25 0.1 0.25 0.1 \
  --true-J 0.045 0.04 0.05 0.035 \
  --true-D 0.1 0.08 0.1 0.08 \
  --true-S 0.25 0.1 0.25 0.1 \
  --contrasts 5 10 13 \
  --truth-samples 4096 --truth-batch 4096 --truth-tries-factor 16 \
  --sample-sites 4 --include-inhibitory-neurons --track_offset_identity \
  --antithetic \
  --disc-layers 512 512 \
  --normalize-input --normalize-input-mode std \
  --reject-unconverged --rate-cost 0.05 \
  --moment-anchor 1e-3 --anchor-ema 0.995 \
  --anchor-ema-late 0.98 \
  --anchor-ema-switch-drift 0.4 \
  --anchor-ema-switch-step 400 \
  --anchor-drift-ema 0.995 \
  --anchor-beta1 0.5 --anchor-updates 8 \
  --gen-learn-rate 1e-8 --disc-learn-rate 1e-3 \
  --critic-lr-decay-steps 0 --lr-decay-steps 0 \
  --gen-ema 0.999 --clip-grad 1.0 \
  --solver-backend pallas --checkpoint-every 1000 --timing-every 500
