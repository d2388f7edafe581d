#!/bin/bash
# Flagship round-3 run: GAN-family J/D recovery on the near-critical
# (5, 10, 13) battery (VERDICT round-2 item #1).
#
# Recipe = rec13big's unconditional-WGAN setup (reject semantics +
# std-whitened critic inputs + 512x512 critic + constant critic lr)
# plus the composed-Adam moment anchor (--moment-anchor): the fixed
# moment witness descends the J/D ridge (proved by mm13fix: J 1.7%)
# while the adversarial witness enforces distribution-level fidelity
# beyond second moments (rec13big showed it sees the stall point the
# moments miss). Data budget 4096 truth samples = the reference-era
# budget (CRLB floor J_II +/-6.7% there).
#
# Waits for the axon TPU chip to become claimable (pool outage active
# when this was written), then runs. Single TPU process at a time.
set -u
cd /root/repo
echo "[watcher] probing for TPU chip grant..." >&2
until timeout 600 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[watcher] $(date +%H:%M:%S) chip still unavailable; retrying" >&2
  sleep 30
done
echo "[watcher] chip granted at $(date +%H:%M:%S); launching rec13anchor2" >&2
exec python -u -m tcgan_tpu.run.gan \
  --datastore runs/rec13anchor2 \
  --N 51 --batch-size 256 --n-steps 60000 \
  --max-iter 8000 --atol 1e-4 \
  --J 0.0585 0.052 0.065 0.0455 \
  --D 0.07 0.056 0.07 0.056 \
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
  --moment-anchor 2e-3 --anchor-ema 0.995 \
  --gen-learn-rate 1e-4 --disc-learn-rate 1e-3 \
  --critic-lr-decay-steps 0 --lr-decay-steps 12000 \
  --gen-ema 0.999 --clip-grad 1.0 \
  --solver-backend pallas --checkpoint-every 2500 --timing-every 500
# Anchor lr 2e-3 / 60k steps: at mm13fix's lr (1e-3) the D error
# crossed 10% only around ~60k steps (21% @30k, 12% @54k) and settled
# at 3.5% by 96k; Adam's settling error scales ~sqrt(lr), so 2e-3
# roughly halves the steps-to-gate at a ~5% expected D settle —
# comfortably inside the 10% gate at ~4h instead of ~6h of chip time.
# Checkpoints every 2500 allow stop/eval at any gate-clearing point.
