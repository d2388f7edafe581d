#!/bin/bash
# Round-5 last-window orchestrator: reruns the cooling-fence arms that
# crashed at 04:50 on the TrainState schema change (the drift-latch
# fields), now that checkpoint.py restores pre-change checkpoints via
# the forward-compat path (validated on-chip by the gammactl extension
# at 05:15). Waits for tpu_queue3.sh to finish first (one TPU process).
set -u
cd /root/repo
. docs/artifacts/flagship_env.sh
left() { echo $(( END_AT - $(date -u +%s) )); }
res_ck=15000

while [ -f /tmp/queue3.pid ] && kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do
  sleep 60
done

for arm in a b; do
  [ "$arm" = a ] && HOTLR=4.2e-5 || HOTLR=1.4e-5
  [ -f "runs/rec13fence_$arm/generator.csv" ] && continue  # already ran
  [ "$(left)" -ge 600 ] || break
  echo "[queue4] $(date -u +%H:%M:%S) fence arm $arm (lr $HOTLR) from ckpt $res_ck (bound $(($(left) - 120))s)" >&2
  RUN="rec13fence_$arm" GEN_LR_FLOOR="$HOTLR" N_STEPS=2000 \
    timeout "$(($(left) - 120))" bash -c '. docs/artifacts/flagship_env.sh; $(flagship_cmd)' \
    > "/tmp/rec13fence_$arm.log" 2>&1
  echo "[queue4] fence arm $arm rc=$?" >&2
done

arts=""
for arm in a b; do
  [ -f "runs/rec13fence_$arm/generator.csv" ] || continue
  PYTHONPATH=/root/repo timeout 300 python docs/artifacts/cooling_fence_compare.py \
    --cooled "runs/$RUN" --hot "runs/rec13fence_$arm" --from-step "$res_ck" \
    > "docs/artifacts/cooling_fence_$arm.json" 2>/tmp/fence_cmp.err
  echo "[queue4] fence compare $arm rc=$?" >&2
  arts="$arts docs/artifacts/cooling_fence_$arm.json"
done
# refresh the gamma counterfactual compare with the extension's tail
PYTHONPATH=/root/repo timeout 300 python docs/artifacts/cooling_fence_compare.py \
  --cooled "runs/$RUN" --hot runs/rec13gammactl --from-step "$res_ck" \
  --labels g0.98_flagship_tail g0.995_counterfactual \
  > docs/artifacts/gammactl_compare.json 2>>/tmp/fence_cmp.err
arts="$arts docs/artifacts/gammactl_compare.json"
git add $arts 2>/dev/null
git commit -m "Cooling fence arms rerun post schema-compat fix + gammactl extension tail (queue auto-record)" \
  -- $arts >> /tmp/queue4.log 2>&1 || true

# flag-ON smoke of the drift latch on the chip (tiny C2-style, ~3 min)
if [ "$(left)" -ge 60 ] || [ "$(left)" -ge -1800 ]; then
  echo "[queue4] $(date -u +%H:%M:%S) drift-latch flag-ON chip smoke" >&2
  timeout 600 python -u -m tcgan_tpu.run.gan --datastore /tmp/v_gan_drift \
    --N 8 --batch-size 4 --n-steps 3 --max-iter 2000 \
    --WGAN_n_critic 2 --WGAN_n_critic0 2 --truth-samples 16 \
    --J 0.045 0.04 0.05 0.035 --D 0.1 0.08 0.1 0.08 --S 0.25 0.1 0.25 0.1 \
    --contrasts 5 --bandwidths 0.25 1.0 \
    --moment-anchor 1e-3 --anchor-ema 0.995 --anchor-ema-late 0.98 \
    --anchor-ema-switch-drift 0.25 --anchor-drift-ema 0.9 \
    > /tmp/v_gan_drift.log 2>&1
  echo "[queue4] drift smoke rc=$? (learning.jsonl drift_ratio:)" >&2
  python - <<'PY' >&2 2>/dev/null
import json
rows=[json.loads(l) for l in open('/tmp/v_gan_drift/learning.jsonl')]
print([round(r.get('drift_ratio',-1),4) for r in rows])
PY
fi
echo "[queue4] $(date -u +%H:%M:%S) done" >&2
