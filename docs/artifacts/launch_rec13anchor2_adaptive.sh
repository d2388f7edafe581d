#!/bin/bash
# Adaptive flagship launcher (round-3 extended endgame, 2026-08-18).
#
# Same run as launch_rec13anchor2.sh (GAN-family J/D recovery on the
# near-critical (5,10,13) battery — VERDICT round-2 item #1), but the
# anchor learning rate and step budget are chosen from the chip time
# ACTUALLY REMAINING when the grant lands, instead of assuming a full
# window:
#
#   - anchor Adam settle error scales ~sqrt(lr); steps-to-gate ~1/lr
#     (BASELINE.md "composed Adam": mm13fix @1e-3 crossed D=10% ~60k
#     steps and settled 3.5%; 2e-3 expects gate ~27-30k at ~5% settle,
#     4e-3 expects gate ~14-17k at ~7% settle — still inside the 10%
#     judge gate, though it may never clear the queue's stricter 7%
#     early-stop gate and will instead run to the deadline, which is
#     fine: the queue stops + evals whatever exists).
#   - ~0.35 s/step on the rec13-era runs => 3.8h of runway is the
#     break-even for the 2e-3 recipe; below that, 4e-3 is the only
#     recipe with a chance to clear the gate before STOP_AT.
#
# Waits for the axon TPU chip to become claimable (pool outage active
# since 2026-08-17 ~21:30 UTC). Single TPU process at a time.
set -u
cd /root/repo
STOP_AT=${STOP_AT:-$(date -u -d "2026-08-18 18:30" +%s)}
echo "[watcher] probing for TPU chip grant (adaptive recipe)..." >&2
until timeout 600 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[watcher] $(date -u +%H:%M:%S) chip still unavailable; retrying" >&2
  sleep 30
done
left=$(( STOP_AT - $(date -u +%s) ))
if [ "$left" -ge 13680 ]; then ANCHOR=2e-3; STEPS=60000
else ANCHOR=4e-3; STEPS=40000; fi
echo "[watcher] chip granted at $(date -u +%H:%M:%S); ${left}s to run-stop -> anchor lr $ANCHOR, $STEPS steps" >&2
exec python -u -m tcgan_tpu.run.gan \
  --datastore runs/rec13anchor2 \
  --N 51 --batch-size 256 --n-steps "$STEPS" \
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
  --moment-anchor "$ANCHOR" --anchor-ema 0.995 \
  --gen-learn-rate 1e-4 --disc-learn-rate 1e-3 \
  --critic-lr-decay-steps 0 --lr-decay-steps 12000 \
  --gen-ema 0.999 --clip-grad 1.0 \
  --solver-backend pallas --checkpoint-every 2500 --timing-every 500
