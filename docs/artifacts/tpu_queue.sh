#!/bin/bash
# Round-3 TPU job-queue orchestrator (one TPU process at a time — the
# axon chip serializes clients, so everything here runs strictly after
# the flagship watcher/run pid exits).
#
# Timeline logic (all UTC, defaults for the 2026-08-18 round-3 endgame;
# override via env):
#   STOP_AT   (06:10) — stop a RUNNING flagship here: leaves room for the
#               full eval queue. A still-PROBING watcher is left alive —
#               a late chip grant still buys a short flagship window.
#   LAST_CALL (06:55) — absolute flagship stop (probing or running):
#               whatever exists gets evaluated.
#   END_AT    (07:18) — hard end for queue TPU work, with margin before
#               the driver's round-end bench (~07:32) so it never queues
#               behind us on the chip.
# Gate-based early stop: J,D <= 7% over a 1000-step window past
# GATE_STEP (default 15000) stops the flagship immediately.
#
# Every TPU step is timeout-bounded by the time actually remaining; if
# the chip never returns, each step times out and nothing wedges.
set -u
cd /root/repo
PIDFILE=/tmp/rec13anchor2.pid
STOP_AT=${STOP_AT:-$(date -u -d "2026-08-18 06:10" +%s)}
LAST_CALL=${LAST_CALL:-$(date -u -d "2026-08-18 06:55" +%s)}
END_AT=${END_AT:-$(date -u -d "2026-08-18 07:18" +%s)}
export GATE_STEP=${GATE_STEP:-15000}

gate_cleared() {
  python - <<'EOF'
import csv, os, sys
import numpy as np
try:
    rows = list(csv.reader(open("runs/rec13anchor2/generator.csv")))
    data = np.array(rows[1:], dtype=float)
except Exception:
    sys.exit(1)
TJ = np.array([0.045, 0.04, 0.05, 0.035])
TD = np.array([0.1, 0.08, 0.1, 0.08])
# generator.csv records EVERY step, so sample rows ~500 steps apart:
# require the gate to hold across a ~1000-step window past GATE_STEP so
# a transient dip does not stop the run
if len(data) < 1001:
    sys.exit(1)
tail = data[[-1001, -501, -1]]
ok = (tail[:, 0].min() >= float(os.environ.get("GATE_STEP", "15000"))
      and (np.abs(tail[:, 1:5] / TJ - 1).mean(1) <= 0.07).all()
      and (np.abs(tail[:, 5:9] / TD - 1).mean(1) <= 0.07).all())
sys.exit(0 if ok else 1)
EOF
}

flagship_started() { [ -f runs/rec13anchor2/learning.csv ]; }

stop_flagship() {
  echo "[queue] $(date -u +%H:%M:%S) stopping flagship ($1)" >&2
  kill "$(cat "$PIDFILE")" 2>/dev/null
  sleep 30
  kill -9 "$(cat "$PIDFILE")" 2>/dev/null
}

echo "[queue] waiting on flagship (run-stop $(date -u -d @"$STOP_AT" +%H:%M), last-call $(date -u -d @"$LAST_CALL" +%H:%M) UTC)" >&2
while [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do
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

left() { echo $(( END_AT - $(date -u +%s) )); }
TRUTH="--true-J 0.045 0.04 0.05 0.035 --true-D 0.1 0.08 0.1 0.08 --true-S 0.25 0.1 0.25 0.1"

if flagship_started && [ "$(left)" -ge 420 ]; then
  echo "[queue] $(date -u +%H:%M:%S) eval rec13anchor2 (bound $(left)s)" >&2
  timeout "$(left)" python -u -m tcgan_tpu.run.eval --run runs/rec13anchor2 \
    --datastore runs/rec13anchor2_eval $TRUTH \
    --truth-samples 4096 --truth-batch 4096 --truth-tries-factor 16 \
    --eval-samples 2048 --params-source csv \
    > /tmp/rec13anchor2_eval.json 2>/tmp/rec13anchor2_eval.err
  echo "[queue] eval rc=$?" >&2
  # host-side one-page fit figure (learning curves + trajectories + TC
  # distribution panels from the eval datastore)
  timeout 600 python -m tcgan_tpu.analysis.fit_quality runs/rec13anchor2 \
    --eval runs/rec13anchor2_eval -o docs/artifacts/rec13anchor2_fit.png \
    > /tmp/rec13anchor2_fit.log 2>&1
  echo "[queue] fit_quality rc=$?" >&2
fi

if [ "$(left)" -ge 420 ]; then
  echo "[queue] $(date -u +%H:%M:%S) mm13fix endpoint eval (bound $(left)s)" >&2
  timeout "$(left)" python -u -m tcgan_tpu.run.eval --run runs/mm13fix \
    --datastore runs/mm13fix_eval $TRUTH \
    --truth-samples 4096 --truth-batch 4096 --truth-tries-factor 16 \
    --eval-samples 2048 --params-source csv \
    > /tmp/mm13fix_eval.json 2>/tmp/mm13fix_eval.err
  echo "[queue] mm13fix eval rc=$?" >&2
fi

if [ "$(left)" -ge 6000 ] && [ ! -d runs/mmens13 ]; then
  echo "[queue] $(date -u +%H:%M:%S) launching mmens13 (bound $(($(left) - 600))s)" >&2
  timeout "$(($(left) - 600))" bash docs/artifacts/launch_mmens13.sh \
    > /tmp/mmens13.log 2>&1
  echo "[queue] mmens13 rc=$?" >&2
  # host-side post-processing (no TPU): seed spread vs the identifiability
  # spectrum for the estimator that recovers parameters
  timeout 600 python -m tcgan_tpu.analysis.ensemble_view runs/mmens13 \
    --jacobian docs/artifacts/jacobian_51013_rich.npz \
    -o docs/artifacts/mmens13.png > /tmp/mmens13_view.log 2>&1
  echo "[queue] ensemble_view rc=$?" >&2
fi
echo "[queue] $(date -u +%H:%M:%S) done" >&2
