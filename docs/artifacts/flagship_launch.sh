#!/bin/bash
# The ONLY sanctioned way to (re)start the flagship by hand.
#
# The 07:31 dual-writer incident (rec13anchor4_incident_0731.md) was a
# manual `nohup $(flagship_cmd) &` racing the watchdog's own resume:
# the manual pid never entered $PIDFILE, so two processes appended to
# the same datastore for 77 minutes. This wrapper makes that impossible:
#   - refuses while $PIDFILE points at a live process,
#   - refuses while the watchdog's $RESUMEFILE is fresh (a watchdog
#     relaunch is in flight),
#   - takes the pidfile slot BEFORE exec'ing, exactly like the watchdog.
set -eu
cd /root/repo
. docs/artifacts/flagship_env.sh

if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
  echo "refusing: flagship already running (pid $(cat "$PIDFILE"))" >&2
  exit 1
fi
if resume_pending; then
  echo "refusing: watchdog resume in flight ($RESUMEFILE fresh)" >&2
  exit 1
fi
# A deliberate manual launch supersedes any earlier intentional stop:
# clear the stopfile, or every watchdog started for this RUN exits at
# its first loop ('queue stopped the run on purpose') and the new
# flagship runs with no crash/hang protection.
rm -f "$STOPFILE"
touch "$RESUMEFILE"
nohup $(flagship_cmd) >> "/tmp/${RUN}.log" 2>&1 &
echo $! > "$PIDFILE"
rm -f "$RESUMEFILE"
# Reset the watchdog's stall clock (same as its own resume path): the
# fresh process inherits a stale generator.csv mtime and writes nothing
# until restore+compile completes — observed 12:39 UTC: the watchdog
# hang-killed a 9-minute-compiling manual launch.
[ -f "runs/$RUN/generator.csv" ] && touch "runs/$RUN/generator.csv"
echo "flagship launched: pid $(cat "$PIDFILE"), log /tmp/${RUN}.log"
