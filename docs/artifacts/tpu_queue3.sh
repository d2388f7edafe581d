#!/bin/bash
# Round-5 final-window orchestrator (replaces tpu_queue2.sh, killed at
# 04:05 UTC). Two fixes vs queue2:
#   - --n-steps is INCREMENTAL on resume (driver.py: range(start,
#     start+n_steps)), so fence/counterfactual arms must pass
#     N_STEPS=2000, not res_ck+2000 (queue2's gammactl ran past 17000
#     until stopped; same latent bug in tpu_queue.sh's fence section).
#   - gammactl already ran (15000->17591, gamma 0.995): D resumed its
#     descent 9.8->7.1% while J re-inflated 5.4->7.7% — the gamma
#     switch CAUSED the flagship's D freeze, and the two gammas
#     allocate a conserved ~7.5% mean(J,D) orbit radius differently.
# Sequence: compare+commit gammactl -> mmens13pm -> fence arms (hot lr,
# gamma 0.98 tail, same ckpt 15000) -> gammactl extension (does D reach
# its floor at 0.995?) -> reopen-margin probe. All time-gated on END_AT.
set -u
cd /root/repo
. docs/artifacts/flagship_env.sh
left() { echo $(( END_AT - $(date -u +%s) )); }
res_ck=15000

# --- 1. gammactl compare + commit ------------------------------------
if [ ! -f docs/artifacts/gammactl_compare.json ]; then
  timeout 300 python docs/artifacts/cooling_fence_compare.py \
    --cooled "runs/$RUN" --hot runs/rec13gammactl --from-step "$res_ck" \
    > docs/artifacts/gammactl_compare.json 2>/tmp/gammactl_cmp.err
  echo "[queue3] gammactl compare rc=$?" >&2
  git add docs/artifacts/gammactl_compare.json 2>/dev/null
  git commit -m "Gamma-switch counterfactual (rec13gammactl): resume ckpt 15000 at gamma 0.995 — D resumes descent, J re-inflates (queue auto-record)" \
    -- docs/artifacts/gammactl_compare.json >> /tmp/queue3.log 2>&1 || true
fi

# --- 2. per-member-data mm ensemble (VERDICT r4 next #4) -------------
if [ "$(left)" -ge 3000 ] && [ ! -d runs/mmens13pm ]; then
  bound=$(( $(left) - 2400 )); [ "$bound" -gt 4200 ] && bound=4200
  echo "[queue3] $(date -u +%H:%M:%S) launching mmens13pm (bound ${bound}s)" >&2
  timeout "$bound" bash docs/artifacts/launch_mmens13pm.sh \
    > /tmp/mmens13pm.log 2>&1
  echo "[queue3] mmens13pm rc=$?" >&2
  timeout 600 python -m tcgan_tpu.analysis.ensemble_view runs/mmens13pm \
    --jacobian docs/artifacts/jacobian_51013_rich.npz \
    -o docs/artifacts/mmens13pm.png > /tmp/mmens13pm_view.log 2>&1
  echo "[queue3] ensemble_view rc=$?" >&2
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
    -- $arts >> /tmp/queue3.log 2>&1 || true
fi

# --- 3. cooling fence / adversarial-tax arms (VERDICT r4 #5+#6) ------
if [ "$(left)" -ge 1400 ] && [ ! -d runs/rec13fence_a ]; then
  for arm in a b; do
    [ "$arm" = a ] && HOTLR=4.2e-5 || HOTLR=1.4e-5
    [ "$(left)" -ge 1400 ] || break
    echo "[queue3] $(date -u +%H:%M:%S) fence arm $arm (lr $HOTLR) from ckpt $res_ck (bound $(($(left) - 300))s)" >&2
    mkdir -p "runs/rec13fence_$arm/ckpt"
    cp -r "runs/$RUN/ckpt/$res_ck" "runs/rec13fence_$arm/ckpt/$res_ck"
    RUN="rec13fence_$arm" GEN_LR_FLOOR="$HOTLR" N_STEPS=2000 \
      timeout "$(($(left) - 300))" bash -c '. docs/artifacts/flagship_env.sh; $(flagship_cmd)' \
      > "/tmp/rec13fence_$arm.log" 2>&1
    echo "[queue3] fence arm $arm rc=$?" >&2
  done
  arts=""
  for arm in a b; do
    [ -d "runs/rec13fence_$arm" ] || continue
    timeout 300 python docs/artifacts/cooling_fence_compare.py \
      --cooled "runs/$RUN" --hot "runs/rec13fence_$arm" \
      --from-step "$res_ck" \
      > "docs/artifacts/cooling_fence_$arm.json" 2>/tmp/fence_cmp.err
    echo "[queue3] fence compare $arm rc=$?" >&2
    [ -f "docs/artifacts/cooling_fence_$arm.json" ] && arts="$arts docs/artifacts/cooling_fence_$arm.json"
  done
  git add $arts 2>/dev/null
  [ -n "$arts" ] && git commit -m "Rich-battery cooling fence: cooled vs hot post-latch tails at two hot lrs (queue auto-record)" \
    -- $arts >> /tmp/queue3.log 2>&1 || true
fi

# --- 4. gammactl extension: D's floor at gamma 0.995 ------------------
if [ "$(left)" -ge 1400 ] && [ ! -f /tmp/gammactl_ext.done ]; then
  echo "[queue3] $(date -u +%H:%M:%S) gammactl extension (bound $(($(left) - 300))s)" >&2
  RUN=rec13gammactl ANCHOR_EMA_LATE=0.995 N_STEPS=2400 \
    timeout "$(($(left) - 300))" bash -c '. docs/artifacts/flagship_env.sh; $(flagship_cmd)' \
    >> /tmp/rec13gammactl.log 2>&1
  echo "[queue3] gammactl ext rc=$?" >&2
  touch /tmp/gammactl_ext.done
  timeout 300 python docs/artifacts/cooling_fence_compare.py \
    --cooled "runs/$RUN" --hot runs/rec13gammactl --from-step "$res_ck" \
    > docs/artifacts/gammactl_compare.json 2>/tmp/gammactl_cmp.err
  git add docs/artifacts/gammactl_compare.json 2>/dev/null
  git commit -m "Gamma counterfactual extension: D's floor under gamma 0.995 (queue auto-record)" \
    -- docs/artifacts/gammactl_compare.json >> /tmp/queue3.log 2>&1 || true
fi

# --- 5. reopen-margin probe ------------------------------------------
if [ "$(left)" -ge 900 ] && [ ! -f docs/artifacts/reopen_margin_probe.json ]; then
  echo "[queue3] $(date -u +%H:%M:%S) reopen-margin probe (bound $(($(left) - 120))s)" >&2
  timeout "$(($(left) - 120))" python docs/artifacts/reopen_margin_probe.py \
    > docs/artifacts/reopen_margin_probe.json 2>/tmp/margin_probe.err
  echo "[queue3] margin probe rc=$?" >&2
  git add docs/artifacts/reopen_margin_probe.json 2>/dev/null
  git commit -m "On-device reopen-margin validation: flag parity + wgan step cost (queue auto-record)" \
    -- docs/artifacts/reopen_margin_probe.json >> /tmp/queue3.log 2>&1 || true
fi
echo "[queue3] $(date -u +%H:%M:%S) done" >&2
