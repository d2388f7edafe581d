#!/bin/bash
# Round-5 TPU queue item (VERDICT r4 next #4; ROUND5 §5): the
# PER-MEMBER-DATA mm ensemble at the measured-optimal gamma 0.98 —
# 8 members, each fit against its OWN independent 4096-sample fake-truth
# dataset (truth seed = base + member), so the member spread includes
# the data's sampling variance and is directly comparable to the
# identifiability CRLB floors (docs/artifacts/rec13rich_identifiability
# .json). Round 4c proved the SHARED-data spread measures limit-cycle
# amplitude along the STRONG Fisher directions (BASELINE.md mmens13) —
# the opposite of posterior width; this run is the posterior-scale
# measurement that finding demands. Same battery/starts/steps as the
# gamma sweep's mmens13g98 arm, so the two are column-comparable.
# Post-process:
#   python -m tcgan_tpu.analysis.ensemble_view runs/mmens13pm \
#     --jacobian docs/artifacts/jacobian_51013_rich.npz \
#     -o docs/artifacts/mmens13pm.png
set -u
cd /root/repo
exec python -u -m tcgan_tpu.run.ensemble \
  --estimator mm --datastore runs/mmens13pm \
  --ensemble 8 --start-jitter 0.05 \
  --data-seed-per-member \
  --N 51 --batch-size 128 --n-steps "${MMENS_STEPS:-4000}" \
  --max-iter 8000 --atol 1e-4 \
  --J 0.045 0.04 0.05 0.035 \
  --D 0.1 0.08 0.1 0.08 \
  --S 0.25 0.1 0.25 0.1 \
  --true-J 0.045 0.04 0.05 0.035 \
  --true-D 0.1 0.08 0.1 0.08 \
  --true-S 0.25 0.1 0.25 0.1 \
  --contrasts 5 10 13 \
  --truth-samples 4096 --truth-batch 4096 --truth-tries-factor 16 \
  --sample-sites 4 --include-inhibitory-neurons --track_offset_identity \
  --antithetic --mm-lr 1e-3 --moment-ema 0.98 \
  --solver-backend pallas --checkpoint-every 2000
