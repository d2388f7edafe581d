# Shared configuration for the round-4 flagship orchestration
# (launch / watchdog / queue all source THIS file, so their deadlines can
# never disagree — ADVICE r3 #1: a queue stop under mismatched STOP_AT
# looked like a crash to the watchdog, which would resurrect a
# deliberately-stopped run and put two processes on the chip).
#
# Round-4 flagship: runs/rec13anchor3 — rec13anchor2 resumed from ckpt
# 10000 with the anchor EMA window shortened 0.995 -> 0.9 per the
# anchor_floor_probe diagnosis (docs/artifacts/anchor_floor_probe.json):
# at the round-3 stall point the witness signal toward truth (1.7e-3)
# was 183x the data floor, but the straight-through EMA's ~200-step lag
# let a critic-driven limit cycle satisfy the anchor on trajectory
# AVERAGE while the stationary moments sat 100x off (fresh-draw residual
# 1.86e-3 vs logged EMA residual 1.9e-5). gamma=0.9 cuts the lag to ~10
# steps (noise floor at eff-N~4.9k is 7.8e-6, still 20x below the
# weakest probe-point signal), so the anchor force tracks the
# instantaneous displacement the cycle was hiding.
#
# All times UTC. Round-4 driver window ends ~01:15 Aug 19; margins:
#   STOP_AT   23:00 — stop a RUNNING flagship (leaves eval-queue room)
#   LAST_CALL 23:40 — absolute flagship stop
#   END_AT    00:30 — hard end for queue TPU work (driver bench after)
RUN=${RUN:-rec13anchor3}
PIDFILE=${PIDFILE:-/tmp/${RUN}.pid}
STOPFILE=${STOPFILE:-/tmp/${RUN}.stopped}   # queue drops this on ANY intentional stop
STOP_AT=${STOP_AT:-$(date -u -d "2026-08-18 23:00" +%s)}
LAST_CALL=${LAST_CALL:-$(date -u -d "2026-08-18 23:40" +%s)}
END_AT=${END_AT:-$(date -u -d "2026-08-19 00:30" +%s)}
export GATE_STEP=${GATE_STEP:-15000}
N_STEPS=${N_STEPS:-60000}
ANCHOR=${ANCHOR:-2e-3}
ANCHOR_EMA=${ANCHOR_EMA:-0.9}

last_step() {
  tail -1 "runs/$RUN/generator.csv" 2>/dev/null | cut -d, -f1
}

# J,D <= 7% (mean over the 4 block entries) across a 1000-step window
# past GATE_STEP. Identical check for queue and watchdog BY CONSTRUCTION
# (both call this function), so a gate stop is never mistaken for a
# crash even without the sentinel.
gate_cleared() {
  RUN="$RUN" python - <<'EOF'
import csv, os, sys
import numpy as np
try:
    rows = list(csv.reader(open(f"runs/{os.environ['RUN']}/generator.csv")))
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

# The one flagship command line (launch and watchdog resume are the SAME
# invocation: --resume is a no-op on a fresh datastore with no ckpt).
flagship_cmd() {
  echo python -u -m tcgan_tpu.run.gan \
    --datastore "runs/$RUN" --resume \
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
    --moment-anchor "$ANCHOR" --anchor-ema "$ANCHOR_EMA" \
    --gen-learn-rate 1e-4 --disc-learn-rate 1e-3 \
    --critic-lr-decay-steps 0 --lr-decay-steps 12000 \
    --gen-ema 0.999 --clip-grad 1.0 \
    --solver-backend pallas --checkpoint-every 2500 --timing-every 500
}
