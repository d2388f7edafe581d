#!/bin/bash
# Optional post-queue TPU item (chip-time permitting after mmens13):
# a science-grade run of the C3 config — BPTT (truncated-scan) gradients
# instead of IFT — on the round-2 parity setup, so the BPTT variant has a
# recorded recovery/W1 result and not only smoke tests.
#
# Setup mirrors the round-2 IFT parity run (BASELINE.md "Round-2 GAN
# fit"): (5,10) battery, single probe site, batch 256, +30%/-30% ridge
# start. seqlen 600 covers the ~460-iteration mean convergence of this
# circuit family at dt=0.5 ms (BASELINE.md round-1 config note);
# --bptt-checkpoint-chunk 100 remats the scan so the backward fits HBM.
# Expected outcome: same distribution-level W1 descent as the IFT run
# (0.0275 -> ~0.009) at a higher per-step cost — recorded either way.
set -u
cd /root/repo
exec timeout "${BPTT_TIMEOUT:-4500}" python -u -m tcgan_tpu.run.bptt_wgan \
  --datastore runs/bptt13 \
  --N 51 --batch-size 256 --n-steps "${BPTT_STEPS:-4000}" \
  --seqlen 600 --bptt-checkpoint-chunk 100 \
  --J 0.0585 0.052 0.065 0.0455 \
  --D 0.07 0.056 0.07 0.056 \
  --S 0.25 0.1 0.25 0.1 \
  --true-J 0.045 0.04 0.05 0.035 \
  --true-D 0.1 0.08 0.1 0.08 \
  --true-S 0.25 0.1 0.25 0.1 \
  --contrasts 5 10 \
  --truth-samples 2048 --truth-batch 2048 \
  --sample-sites 1 \
  --disc-layers 128 128 \
  --normalize-input --clip-grad 1.0 \
  --gen-learn-rate 1e-4 --disc-learn-rate 1e-3 \
  --solver-backend xla --checkpoint-every 1000 --timing-every 500
