#!/bin/bash
# Crash-resume watchdog for the flagship recovery run (rec13anchor2).
#
# The tpu_queue.sh orchestrator stops the flagship ON PURPOSE in three
# cases (recovery gate cleared, STOP_AT deadline, LAST_CALL); a watchdog
# that blindly resurrects the pid would fight the queue and put TWO
# processes on the chip. So the resume conditions are conservative —
# resume only when ALL hold:
#   - the pid in /tmp/rec13anchor2.pid is dead,
#   - generator.csv shows the run ended early (< N_STEPS - 100),
#   - we are well before the queue's STOP_AT (5 min margin), and
#   - the queue's gate condition does NOT hold (same check, duplicated
#     here verbatim so a gate-stop is never mistaken for a crash).
# The resumed process reuses the SAME pidfile, so the still-running queue
# keeps tracking it transparently (it re-reads the pidfile every loop).
#
# Checkpoints land every 2500 steps; a crash costs at most ~40 min of
# progress at the measured ~0.95 s/step.
set -u
cd /root/repo
PIDFILE=/tmp/rec13anchor2.pid
STOP_AT=${STOP_AT:-$(date -u -d "2026-08-18 18:00" +%s)}
N_STEPS=${N_STEPS:-60000}
ANCHOR=${ANCHOR:-2e-3}

last_step() {
  tail -1 runs/rec13anchor2/generator.csv 2>/dev/null | cut -d, -f1
}

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
if len(data) < 1001:
    sys.exit(1)
tail = data[[-1001, -501, -1]]
ok = (tail[:, 0].min() >= float(os.environ.get("GATE_STEP", "15000"))
      and (np.abs(tail[:, 1:5] / TJ - 1).mean(1) <= 0.07).all()
      and (np.abs(tail[:, 5:9] / TD - 1).mean(1) <= 0.07).all())
sys.exit(0 if ok else 1)
EOF
}

while :; do
  now=$(date -u +%s)
  [ "$now" -ge $((STOP_AT - 300)) ] && { echo "[watchdog] window over"; exit 0; }
  if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    sleep 60; continue
  fi
  step=$(last_step)
  if [ -z "$step" ] || [ "$step" = "step" ]; then sleep 60; continue; fi
  if [ "${step%.*}" -ge $((N_STEPS - 100)) ]; then
    echo "[watchdog] run complete at step $step"; exit 0
  fi
  if gate_cleared; then
    echo "[watchdog] gate cleared — queue stopped it on purpose"; exit 0
  fi
  echo "[watchdog] $(date -u +%H:%M:%S) flagship dead at step $step — resuming" >&2
  nohup python -u -m tcgan_tpu.run.gan \
    --datastore runs/rec13anchor2 --resume \
    --N 51 --batch-size 256 --n-steps "$N_STEPS" \
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
    --solver-backend pallas --checkpoint-every 2500 --timing-every 500 \
    >> /tmp/rec13anchor2.log 2>&1 &
  echo $! > "$PIDFILE"
  sleep 300   # give the resume time to restore + recompile before re-checking
done
