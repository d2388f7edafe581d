#!/bin/bash
# Crash-resume watchdog for the flagship recovery run.
#
# Deadlines, gate check, pidfile, and the flagship command line all come
# from flagship_env.sh — shared verbatim with tpu_queue.sh, so the two
# scripts cannot disagree about when a stop is intentional (ADVICE r3
# #1). The queue additionally drops $STOPFILE on ANY intentional stop;
# the watchdog treats it as terminal. Resume only when ALL hold:
#   - no $STOPFILE (the queue never stopped the run on purpose),
#   - the pid in $PIDFILE is dead,
#   - generator.csv shows the run ended early (< N_STEPS - 100),
#   - we are >5 min before min(STOP_AT, LAST_CALL), and
#   - the recovery gate does NOT hold (shared gate_cleared()).
# The resumed process reuses the SAME pidfile, so a running queue keeps
# tracking it transparently (it re-reads the pidfile every loop).
#
# Checkpoints land every 2500 steps; a crash costs at most ~40 min of
# progress at the measured ~0.95 s/step.
set -u
cd /root/repo
. docs/artifacts/flagship_env.sh
# Never leave a resume sentinel behind on any exit path — a stale one
# would make the queue wait out RESUME_FRESH_S for a resume that is not
# coming.
trap 'rm -f "$RESUMEFILE"' EXIT

DEADLINE=$(( STOP_AT < LAST_CALL ? STOP_AT : LAST_CALL ))

while :; do
  now=$(date -u +%s)
  [ "$now" -ge $((DEADLINE - 300)) ] && { echo "[watchdog] window over"; exit 0; }
  [ -f "$STOPFILE" ] && { echo "[watchdog] queue stopped the run on purpose ($(cat "$STOPFILE"))"; exit 0; }
  if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    # Hang detection (round 4c): the 06:36 incident was a LIVE pid blocked
    # forever on a futex after the TPU tunnel broke mid-step — recorders
    # flush every step (~1.6 s), so a progress file silent for >10 min
    # means the process is wedged, not slow. Kill it (by pidfile, never by
    # pattern) and fall through to the normal dead-pid resume path.
    prog="runs/$RUN/generator.csv"
    if [ -f "$prog" ]; then
      age=$(( $(date -u +%s) - $(stat -c %Y "$prog") ))
      if [ "$age" -gt "${STALL_S:-600}" ]; then
        echo "[watchdog] $(date -u +%H:%M:%S) pid alive but $prog silent ${age}s — killing wedged flagship" >&2
        touch "$RESUMEFILE"   # tell the queue this dead-pid window is a resume, not a finish
        kill "$(cat "$PIDFILE")" 2>/dev/null; sleep 10
        kill -9 "$(cat "$PIDFILE")" 2>/dev/null; sleep 5
      else
        sleep 60; continue
      fi
    else
      sleep 60; continue
    fi
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
  touch "$RESUMEFILE"
  nohup $(flagship_cmd) >> "/tmp/${RUN}.log" 2>&1 &
  echo $! > "$PIDFILE"
  rm -f "$RESUMEFILE"
  # Reset the stall clock: the relaunched process inherits the dead
  # run's stale generator.csv mtime and writes nothing until
  # restore+recompile completes — without this, a cold-cache resume
  # slower than sleep(300)+STALL_S gets hang-killed mid-compile, forever.
  [ -f "runs/$RUN/generator.csv" ] && touch "runs/$RUN/generator.csv"
  sleep 300   # give the resume time to restore + recompile before re-checking
done
