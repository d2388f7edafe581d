#!/bin/bash
# TPU queue item (after the flagship rec13anchor2): multi-start moment
# matching on the near-critical (5,10,13) battery — seed-spread vs the
# identifiability spectrum / CRLB for the estimator that actually
# recovers parameters (VERDICT r2 #9's science leg).
# 8 members, truth-centred 0.05 log-jitter start (as runs/ens_ridge),
# moment-EMA on. ~8k steps; one jitted program. Post-process with:
#   python -m tcgan_tpu.analysis.ensemble_view runs/mmens13 \
#     --jacobian docs/artifacts/jacobian_51013_rich.npz -o docs/artifacts/mmens13.png
set -u
cd /root/repo
exec python -u -m tcgan_tpu.run.ensemble \
  --estimator mm --datastore runs/mmens13 \
  --ensemble 8 --start-jitter 0.05 \
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
  --antithetic --mm-lr 1e-3 --moment-ema 0.995 \
  --solver-backend pallas --checkpoint-every 2000
