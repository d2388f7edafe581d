#!/bin/bash
# Round-5 late-window orchestrator — takes over from tpu_queue.sh after
# the flagship endpoint (the builder killed the original queue at 03:50
# UTC, between eval-chain items, to insert the gamma-switch
# counterfactual the 03:40 endpoint data demanded: D bottomed at 7.4%
# exactly at the 0.995->0.98 anchor-EMA switch (step 10000) and then
# REGRESSED to ~9.9% while J reached mm-grade 5.3% — the one unplanned
# question worth chip time tonight is whether the switch caused it).
#
# Sequence (each item time-gated like tpu_queue.sh; END_AT hard-bounds
# all TPU work before the driver's round-end bench):
#   0. finish the flagship eval chain (report + record + commit)
#   1. rec13gammactl — resume ckpt 14000 with ANCHOR_EMA_LATE=0.995
#      (i.e. NO late-gamma switch), 2000 steps. Paired read vs the
#      flagship's own 14000->16000 tail (gamma 0.98): if gamma caused
#      the D reversal, D resumes its -2%/1k descent here.
#   2. mmens13pm — per-member-data mm ensemble (VERDICT r4 next #4),
#      bounded to leave >=2700 s for the fence.
#   3. rec13fence_a/b — hot-lr continuations from the SAME ckpt 14000
#      (VERDICT r4 next #5+#6): adversarial lr floored at 4.2e-5 / 1.4e-5,
#      anchor schedule identical to the flagship tail. Three-arm read
#      with item 1: {gamma 0.98, gamma 0.995} x {lr ~0, lr hot}.
#   4. reopen-margin probe (round-5 wgan_step root-cause validation).
set -u
cd /root/repo
. docs/artifacts/flagship_env.sh

left() { echo $(( END_AT - $(date -u +%s) )); }
TRUTH="--true-J 0.045 0.04 0.05 0.035 --true-D 0.1 0.08 0.1 0.08 --true-S 0.25 0.1 0.25 0.1"

# --- 0. finish the eval chain (eval/fit/uncertainty already done) ----
if [ ! -f "docs/artifacts/${RUN}_result.md" ]; then
  timeout 600 python -m tcgan_tpu.analysis.report "runs/$RUN" \
    -o "docs/artifacts/${RUN}_report.md" > "/tmp/${RUN}_report.log" 2>&1
  echo "[queue2] report rc=$?" >&2
  cp -f "/tmp/${RUN}_eval.json" "docs/artifacts/${RUN}_eval.json" 2>/dev/null
  timeout 300 python docs/artifacts/record_flagship_result.py \
    --run "runs/$RUN" --eval "docs/artifacts/${RUN}_eval.json" \
    --uncertainty "docs/artifacts/${RUN}_uncertainty.json" --tail 1000 \
    > "docs/artifacts/${RUN}_result.md" 2>"/tmp/${RUN}_result.err"
  echo "[queue2] record rc=$?" >&2
  arts=""
  for f in "docs/artifacts/${RUN}_eval.json" \
           "docs/artifacts/${RUN}_uncertainty.json" \
           "docs/artifacts/${RUN}_result.md" \
           "docs/artifacts/${RUN}_report.md" \
           "docs/artifacts/${RUN}_fit.png"; do
    [ -f "$f" ] && arts="$arts $f"
  done
  git add $arts 2>/dev/null
  [ -n "$arts" ] && git commit -m "Flagship ${RUN}: eval, uncertainty, fit figure, and result block (queue auto-record)" \
    -- $arts >> /tmp/queue2.log 2>&1 || true
fi

# Shared resume point for items 1 and 3: latest ckpt <= last-2000.
res_ck=""
if [ -d "runs/$RUN/ckpt" ]; then
  last_ck=$(ls "runs/$RUN/ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
  res_ck=$(ls "runs/$RUN/ckpt" | grep -E '^[0-9]+$' | sort -n \
           | awk -v hi=$((last_ck - 2000)) -v lo="$GATE_STEP" \
                 '$1 <= hi && $1 >= lo' | tail -1)
fi

# --- 1. gamma-switch counterfactual ---------------------------------
if [ -n "$res_ck" ] && [ "$(left)" -ge 2400 ] && [ ! -d runs/rec13gammactl ]; then
  echo "[queue2] $(date -u +%H:%M:%S) gammactl from ckpt $res_ck (bound $(($(left) - 2400))s)" >&2
  mkdir -p runs/rec13gammactl/ckpt
  cp -r "runs/$RUN/ckpt/$res_ck" "runs/rec13gammactl/ckpt/$res_ck"
  RUN=rec13gammactl ANCHOR_EMA_LATE=0.995 N_STEPS=$((res_ck + 2000)) \
    timeout 2100 bash -c '. docs/artifacts/flagship_env.sh; $(flagship_cmd)' \
    > /tmp/rec13gammactl.log 2>&1
  echo "[queue2] gammactl rc=$?" >&2
  timeout 300 python docs/artifacts/cooling_fence_compare.py \
    --cooled "runs/$RUN" --hot runs/rec13gammactl --from-step "$res_ck" \
    > docs/artifacts/gammactl_compare.json 2>/tmp/gammactl_cmp.err
  echo "[queue2] gammactl compare rc=$?" >&2
  git add docs/artifacts/gammactl_compare.json 2>/dev/null
  git commit -m "Gamma-switch counterfactual: resume ckpt $res_ck at gamma 0.995 vs the flagship's 0.98 tail (queue auto-record)" \
    -- docs/artifacts/gammactl_compare.json >> /tmp/queue2.log 2>&1 || true
fi

# --- 2. per-member-data mm ensemble (VERDICT r4 next #4) -------------
if [ "$(left)" -ge 3000 ] && [ ! -d runs/mmens13pm ]; then
  bound=$(( $(left) - 2700 )); [ "$bound" -gt 4500 ] && bound=4500
  echo "[queue2] $(date -u +%H:%M:%S) launching mmens13pm (bound ${bound}s)" >&2
  timeout "$bound" bash docs/artifacts/launch_mmens13pm.sh \
    > /tmp/mmens13pm.log 2>&1
  echo "[queue2] mmens13pm rc=$?" >&2
  timeout 600 python -m tcgan_tpu.analysis.ensemble_view runs/mmens13pm \
    --jacobian docs/artifacts/jacobian_51013_rich.npz \
    -o docs/artifacts/mmens13pm.png > /tmp/mmens13pm_view.log 2>&1
  echo "[queue2] ensemble_view rc=$?" >&2
  timeout 600 python -m tcgan_tpu.analysis.report runs/mmens13pm \
    -o docs/artifacts/mmens13pm_report.md > /tmp/mmens13pm_report.log 2>&1
  [ -f runs/mmens13pm/ensemble_summary.json ] && \
    cp -f runs/mmens13pm/ensemble_summary.json docs/artifacts/mmens13pm_summary.json
  arts=""
  for f in docs/artifacts/mmens13pm.png docs/artifacts/mmens13pm_report.md \
           docs/artifacts/mmens13pm_summary.json; do
    [ -f "$f" ] && arts="$arts $f"
  done
  git add $arts 2>/dev/null
  [ -n "$arts" ] && git commit -m "Per-member-data mm ensemble (mmens13pm): member spread vs CRLB floors (queue auto-record)" \
    -- $arts >> /tmp/queue2.log 2>&1 || true
fi

# --- 3. cooling fence / adversarial-tax arms (VERDICT r4 #5+#6) ------
if [ -n "$res_ck" ] && [ "$(left)" -ge 1500 ] && [ ! -d runs/rec13fence_a ]; then
  for arm in a b; do
    [ "$arm" = a ] && HOTLR=4.2e-5 || HOTLR=1.4e-5
    [ "$(left)" -ge 1500 ] || break
    echo "[queue2] $(date -u +%H:%M:%S) fence arm $arm (lr $HOTLR) from ckpt $res_ck (bound $(($(left) - 300))s)" >&2
    mkdir -p "runs/rec13fence_$arm/ckpt"
    cp -r "runs/$RUN/ckpt/$res_ck" "runs/rec13fence_$arm/ckpt/$res_ck"
    RUN="rec13fence_$arm" GEN_LR_FLOOR="$HOTLR" N_STEPS=$((res_ck + 2000)) \
      timeout "$(($(left) - 300))" bash -c '. docs/artifacts/flagship_env.sh; $(flagship_cmd)' \
      > "/tmp/rec13fence_$arm.log" 2>&1
    echo "[queue2] fence arm $arm rc=$?" >&2
  done
  arts=""
  for arm in a b; do
    [ -d "runs/rec13fence_$arm" ] || continue
    timeout 300 python docs/artifacts/cooling_fence_compare.py \
      --cooled "runs/$RUN" --hot "runs/rec13fence_$arm" \
      --from-step "$res_ck" \
      > "docs/artifacts/cooling_fence_$arm.json" 2>/tmp/fence_cmp.err
    echo "[queue2] fence compare $arm rc=$?" >&2
    [ -f "docs/artifacts/cooling_fence_$arm.json" ] && arts="$arts docs/artifacts/cooling_fence_$arm.json"
  done
  git add $arts 2>/dev/null
  [ -n "$arts" ] && git commit -m "Rich-battery cooling fence: cooled vs hot post-latch tails at two hot lrs (queue auto-record)" \
    -- $arts >> /tmp/queue2.log 2>&1 || true
fi

# --- 4. reopen-margin probe ------------------------------------------
if [ "$(left)" -ge 900 ] && [ ! -f docs/artifacts/reopen_margin_probe.json ]; then
  echo "[queue2] $(date -u +%H:%M:%S) reopen-margin probe (bound $(($(left) - 120))s)" >&2
  timeout "$(($(left) - 120))" python docs/artifacts/reopen_margin_probe.py \
    > docs/artifacts/reopen_margin_probe.json 2>/tmp/margin_probe.err
  echo "[queue2] margin probe rc=$?" >&2
  git add docs/artifacts/reopen_margin_probe.json 2>/dev/null
  git commit -m "On-device reopen-margin validation: flag parity + wgan step cost (queue auto-record)" \
    -- docs/artifacts/reopen_margin_probe.json >> /tmp/queue2.log 2>&1 || true
fi
echo "[queue2] $(date -u +%H:%M:%S) done" >&2
