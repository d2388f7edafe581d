#!/bin/bash
# Round-4 TPU job-queue orchestrator (one TPU process at a time — the
# axon chip serializes clients, so everything here runs strictly after
# the flagship pid exits).
#
# Deadlines/gate/pidfile come from flagship_env.sh, shared with the
# watchdog (ADVICE r3 #1). On ANY intentional stop this script drops
# $STOPFILE so the watchdog can never mistake it for a crash.
#
# Timeline (UTC, env-overridable): STOP_AT stops a RUNNING flagship
# (leaves room for the eval queue); LAST_CALL is the absolute flagship
# stop; END_AT hard-ends queue TPU work with margin before the driver's
# round-end bench. Gate-based early stop: J,D <= 7% over a 1000-step
# window past GATE_STEP stops the flagship immediately.
#
# Every TPU step is timeout-bounded by the time actually remaining; if
# the chip never returns, each step times out and nothing wedges.
set -u
cd /root/repo
. docs/artifacts/flagship_env.sh

stop_flagship() {
  echo "[queue] $(date -u +%H:%M:%S) stopping flagship ($1)" >&2
  echo "$1" > "$STOPFILE"
  kill "$(cat "$PIDFILE")" 2>/dev/null
  sleep 30
  kill -9 "$(cat "$PIDFILE")" 2>/dev/null
}

flagship_started() { [ -f "runs/$RUN/learning.csv" ]; }

echo "[queue] waiting on flagship (run-stop $(date -u -d @"$STOP_AT" +%H:%M), last-call $(date -u -d @"$LAST_CALL" +%H:%M) UTC)" >&2
while :; do
  if ! { [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; }; then
    # Dead pid: only treat it as "flagship finished" if the watchdog is
    # not mid-resume (fresh $RESUMEFILE) — otherwise this loop would race
    # the watchdog's kill-and-relaunch of a wedged process and start the
    # eval chain on a half-finished run (fired 2026-08-19 07:30).
    if resume_pending; then sleep 30; continue; fi
    # Finished vs crashed: an intentional stop ($STOPFILE), a cleared
    # gate, or a last step at/near N_STEPS means the flagship is DONE —
    # break immediately. Anything else may be a crash the watchdog
    # hasn't seen yet (it polls every 60 s; its sentinel only covers the
    # hang-kill path), so grant a full 90 s for it to claim the dead pid
    # before declaring the run finished and evaluating a partial fit.
    step=$(last_step)
    if [ -f "$STOPFILE" ] || gate_cleared \
        || { [ -n "$step" ] && [ "$step" != "step" ] \
             && [ "${step%.*}" -ge $((N_STEPS - 100)) ]; }; then
      break
    fi
    sleep 90
    if { [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; } || resume_pending; then
      continue
    fi
    break
  fi
  now=$(date -u +%s)
  if [ "$now" -ge "$LAST_CALL" ]; then
    stop_flagship "last call"; break
  fi
  if flagship_started && [ "$now" -ge "$STOP_AT" ]; then
    stop_flagship "deadline"; break
  fi
  if gate_cleared; then
    stop_flagship "recovery gate cleared"; break
  fi
  sleep 120
done
sleep 10
[ -f "$STOPFILE" ] || echo "flagship exited on its own" > "$STOPFILE"

left() { echo $(( END_AT - $(date -u +%s) )); }
TRUTH="--true-J 0.045 0.04 0.05 0.035 --true-D 0.1 0.08 0.1 0.08 --true-S 0.25 0.1 0.25 0.1"

# params-source npz_ema: the run trains with --gen-ema 0.999, and the
# EMA params are the principled estimator for an endpoint that
# oscillates in the anchor's curved valley (measured at step 11k:
# raw J 10.1% vs EMA J 9.6% — the EMA reads the oscillation center).
if flagship_started && [ "$(left)" -ge 420 ]; then
  # Strip the 07:31 dual-writer duplicates (keep-last per step — see
  # rec13anchor4_incident_0731.md) BEFORE anything reads the curves.
  # Safe here: the flagship pid is dead past the wait loop, and the
  # script refuses on a live pidfile anyway.
  timeout 300 python docs/artifacts/dedup_datastore.py "runs/$RUN" \
    >> /tmp/queue.log 2>&1
  echo "[queue] $(date -u +%H:%M:%S) eval $RUN (bound $(left)s)" >&2
  timeout "$(left)" python -u -m tcgan_tpu.run.eval --run "runs/$RUN" \
    --datastore "runs/${RUN}_eval" $TRUTH \
    --truth-samples 4096 --truth-batch 4096 --truth-tries-factor 16 \
    --eval-samples 2048 --params-source npz_ema \
    > "/tmp/${RUN}_eval.json" 2>"/tmp/${RUN}_eval.err"
  echo "[queue] eval rc=$?" >&2
  # host-side one-page fit figure (learning curves + trajectories + TC
  # distribution panels from the eval datastore)
  timeout 600 python -m tcgan_tpu.analysis.fit_quality "runs/$RUN" \
    --eval "runs/${RUN}_eval" -o "docs/artifacts/${RUN}_fit.png" \
    > "/tmp/${RUN}_fit.log" 2>&1
  echo "[queue] fit_quality rc=$?" >&2
  # information-vs-optimization calibration verdict at the endpoint.
  # NOTE the CLI shape: --run is a required FLAG and there is no --eval
  # (validated end-to-end on a CPU toy run 2026-08-19 — the previous
  # positional invocation exited 2 on argparse and would have burned the
  # post-gate chain); model config + truth default-load from info.json,
  # $TRUTH passed anyway as a defensive override.
  timeout 900 python -m tcgan_tpu.analysis.uncertainty --run "runs/$RUN" \
    $TRUTH \
    > "docs/artifacts/${RUN}_uncertainty.json" 2>"/tmp/${RUN}_unc.err"
  echo "[queue] uncertainty rc=$?" >&2
  # one-command markdown run report
  timeout 600 python -m tcgan_tpu.analysis.report "runs/$RUN" \
    -o "docs/artifacts/${RUN}_report.md" > "/tmp/${RUN}_report.log" 2>&1
  echo "[queue] report rc=$?" >&2
  # BASELINE-ready markdown block + durable copies of the eval JSONs.
  # The builder session can die at any time (the 04:27-07:17 window was
  # a string of API-killed sessions), so the queue itself makes the
  # science artifacts durable with a commit the moment they exist.
  cp -f "/tmp/${RUN}_eval.json" "docs/artifacts/${RUN}_eval.json" 2>/dev/null
  # --tail 1000 matches the recovery gate's averaging window: a 2000-step
  # tail over a still-descending trajectory would report a WORSE error
  # than the window the gate actually certified.
  timeout 300 python docs/artifacts/record_flagship_result.py \
    --run "runs/$RUN" --eval "docs/artifacts/${RUN}_eval.json" \
    --uncertainty "docs/artifacts/${RUN}_uncertainty.json" --tail 1000 \
    > "docs/artifacts/${RUN}_result.md" 2>"/tmp/${RUN}_result.err"
  echo "[queue] record rc=$?" >&2
  git add "docs/artifacts/${RUN}_eval.json" \
    "docs/artifacts/${RUN}_uncertainty.json" \
    "docs/artifacts/${RUN}_result.md" \
    "docs/artifacts/${RUN}_report.md" \
    "docs/artifacts/${RUN}_fit.png" 2>/dev/null
  # pathspec commit: only the artifact files, never whatever the builder
  # session happens to have staged in the shared repo. Only EXISTING
  # files go in the pathspec — one missing path aborts the whole commit.
  arts=""
  for f in "docs/artifacts/${RUN}_eval.json" \
           "docs/artifacts/${RUN}_uncertainty.json" \
           "docs/artifacts/${RUN}_result.md" \
           "docs/artifacts/${RUN}_report.md" \
           "docs/artifacts/${RUN}_fit.png"; do
    [ -f "$f" ] && arts="$arts $f"
  done
  [ -n "$arts" ] && git commit -m "Flagship ${RUN}: eval, uncertainty, fit figure, and result block (queue auto-record)" \
    -- $arts >> /tmp/queue.log 2>&1 || true
fi

# Round-5 science queue (replaces round 4c's mmens13/bptt13, both DONE
# and recorded in BASELINE.md).

# VERDICT r4 next #4: per-member-data mm ensemble at gamma 0.98 — the
# CRLB-comparable spread measurement. run.ensemble survives its timeout
# gracefully (summary + checkpoint at whatever step it reached); a
# ~2.5k-step ensemble from 5% jitter already measures the seed spread.
if [ "$(left)" -ge 3000 ] && [ ! -d runs/mmens13pm ]; then
  echo "[queue] $(date -u +%H:%M:%S) launching mmens13pm (bound $(($(left) - 600))s)" >&2
  timeout "$(($(left) - 600))" bash docs/artifacts/launch_mmens13pm.sh \
    > /tmp/mmens13pm.log 2>&1
  echo "[queue] mmens13pm rc=$?" >&2
  timeout 600 python -m tcgan_tpu.analysis.ensemble_view runs/mmens13pm \
    --jacobian docs/artifacts/jacobian_51013_rich.npz \
    -o docs/artifacts/mmens13pm.png > /tmp/mmens13pm_view.log 2>&1
  echo "[queue] ensemble_view rc=$?" >&2
  timeout 600 python -m tcgan_tpu.analysis.report runs/mmens13pm \
    -o docs/artifacts/mmens13pm_report.md > /tmp/mmens13pm_report.log 2>&1
  git add docs/artifacts/mmens13pm.png docs/artifacts/mmens13pm_report.md 2>/dev/null
  [ -f runs/mmens13pm/ensemble_summary.json ] && \
    cp -f runs/mmens13pm/ensemble_summary.json docs/artifacts/mmens13pm_summary.json && \
    git add docs/artifacts/mmens13pm_summary.json
  arts=""
  for f in docs/artifacts/mmens13pm.png docs/artifacts/mmens13pm_report.md \
           docs/artifacts/mmens13pm_summary.json; do
    [ -f "$f" ] && arts="$arts $f"
  done
  [ -n "$arts" ] && git commit -m "Per-member-data mm ensemble (mmens13pm): member spread vs CRLB floors (queue auto-record)" \
    -- $arts >> /tmp/queue.log 2>&1 || true
fi

# VERDICT r4 next #6 + #5 (opportunistic): rich-battery cooling fence /
# adversarial-tax scaling — TWO hot continuations of the flagship from a
# late checkpoint, with the adversarial lr floored at 4.2e-5 and at
# 1.4e-5 (3x apart), anchor schedule otherwise IDENTICAL. Paired read:
# the flagship's own cooled tail vs each hot tail over the same absolute
# step range; if the equilibrium model holds, the hot arms' J/D floors
# scale ~ lr (ROUND5 §3's floor~lr_g test, made direct by the fact that
# the recipe run latched at step 205 and has no live lr_g of its own).
if [ "$(left)" -ge 3600 ] && [ ! -d runs/rec13fence_a ] \
    && [ -d "runs/$RUN/ckpt" ]; then
  last_ck=$(ls "runs/$RUN/ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
  # resume point: latest checkpoint <= last_ck - 2000 and past the gate
  # window start, so both arms share every schedule event in the range
  res_ck=$(ls "runs/$RUN/ckpt" | grep -E '^[0-9]+$' | sort -n \
           | awk -v hi=$((last_ck - 2000)) -v lo="$GATE_STEP" \
                 '$1 <= hi && $1 >= lo' | tail -1)
  if [ -n "$res_ck" ]; then
    for arm in a b; do
      [ "$arm" = a ] && HOTLR=4.2e-5 || HOTLR=1.4e-5
      [ "$(left)" -ge 1500 ] || break
      echo "[queue] $(date -u +%H:%M:%S) fence arm $arm (lr $HOTLR) from ckpt $res_ck (bound $(($(left) - 600))s)" >&2
      mkdir -p "runs/rec13fence_$arm/ckpt"
      cp -r "runs/$RUN/ckpt/$res_ck" "runs/rec13fence_$arm/ckpt/$res_ck"
      RUN="rec13fence_$arm" GEN_LR_FLOOR="$HOTLR" N_STEPS=$((res_ck + 2000)) \
        timeout "$(($(left) - 600))" bash -c '. docs/artifacts/flagship_env.sh; $(flagship_cmd)' \
        > "/tmp/rec13fence_$arm.log" 2>&1
      echo "[queue] fence arm $arm rc=$?" >&2
    done
    for arm in a b; do
      [ -d "runs/rec13fence_$arm" ] || continue
      timeout 300 python docs/artifacts/cooling_fence_compare.py \
        --cooled "runs/$RUN" --hot "runs/rec13fence_$arm" \
        --from-step "$res_ck" \
        > "docs/artifacts/cooling_fence_$arm.json" 2>/tmp/fence_cmp.err
      echo "[queue] fence compare $arm rc=$?" >&2
      git add "docs/artifacts/cooling_fence_$arm.json" 2>/dev/null
    done
    git commit -m "Rich-battery cooling fence: cooled vs hot post-latch tails at two hot lrs (queue auto-record)" \
      -- docs/artifacts/cooling_fence_a.json docs/artifacts/cooling_fence_b.json \
      >> /tmp/queue.log 2>&1 || true
  fi
fi

# On-device reopen-margin validation (BASELINE.md round-5 wgan_step root
# cause): flag parity on a divergence-heavy batch + wgan step cost at
# margin 0 vs 2.0, one TPU process, ~10 min.
if [ "$(left)" -ge 900 ] && [ ! -f docs/artifacts/reopen_margin_probe.json ]; then
  echo "[queue] $(date -u +%H:%M:%S) reopen-margin probe (bound $(($(left) - 120))s)" >&2
  timeout "$(($(left) - 120))" python docs/artifacts/reopen_margin_probe.py \
    > docs/artifacts/reopen_margin_probe.json 2>/tmp/margin_probe.err
  echo "[queue] margin probe rc=$?" >&2
  git add docs/artifacts/reopen_margin_probe.json 2>/dev/null
  git commit -m "On-device reopen-margin validation: flag parity + wgan step cost (queue auto-record)" \
    -- docs/artifacts/reopen_margin_probe.json >> /tmp/queue.log 2>&1 || true
fi
echo "[queue] $(date -u +%H:%M:%S) done" >&2
