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
# Phase 2 (2026-08-18 ~22:00 UTC, builder session restarted with a fresh
# ~12h window): at 36.4k steps J had recovered to 6.9% (still falling)
# but D sat FLAT at 25.5% (slope -0.02%/1k -> 26% projected at 60k; the
# gate could never fire). anchor_d_probe.json rules out starvation (the
# J-corrected residual is 35x the truth level — the witness demands D);
# the stall is per-step gradient SNR along the J/D ridge: the anchor's
# Adam drifts at lr x SNR, and gamma=0.9's 20x-noisier EMA (the round-3
# limit-cycle fix that rescued J) starved D's tiny signal. Calibration:
# mm13fix (lr 1e-3, gamma 0.995, eff-N 51k) descended D at ~0.2%/1k —
# 92k more steps at that pace. Phase 2 resumes from ckpt 35000 with
#   ANCHOR     2e-3 -> 1e-2   (5x drift; lr-scaling study: stable <2.5e-2)
#   ANCHOR_EMA 0.9  -> 0.98   (eff-N 12.8k, lag ~50 steps — between the
#                              limit-cycle-prone 0.995/200 and the
#                              D-starved 0.9/10)
#   ANCHOR_B1  0.5  -> 0.9    (new --anchor-beta1: gradient averaged
#                              over ~10 steps at ~10-step lag — variance
#                              reduction the EMA can only buy with lag)
# Expected D rate ~1%/1k -> gate window ~18k steps. J's gate margin is
# protected by its 4x-larger signal. Checkpoints every 1000 steps so a
# bad config costs <17 min.
#
# Phase-2 OUTCOME (22:00-22:15 UTC): UNSTABLE — lr 1e-2 (+b1 0.9)
# destabilized the production battery within ~500 steps of the resume
# (ckpt 37500): params shot AWAY from truth (S 6.5% -> 10.8%, D 25.6 ->
# 31%), anchor residual 5e-5 -> 4.7e-2, survivor yield -> 1.0 (the
# easy/wrong region), critic accuracy -> 0.98. Killed at step 38648
# (the new graceful-stop checkpointed it; poisoned ckpts 38000/38648
# deleted). Lesson recorded in --anchor-updates help: raise the anchor's
# UPDATE COUNT, not its step size.
#
# Phase 3 (22:20 UTC): resume ckpt 37500 with the throughput lever:
#   ANCHOR          2e-3   (phase-1-proven stable on THIS battery)
#   ANCHOR_EMA      0.995  (mm13fix's noise regime, eff-N ~51k; the
#                           round-3 limit-cycle risk at this gamma was
#                           driven by fast critic-coupled J motion —
#                           J is now converged (6.6%) and gen lr is
#                           decayed 8x, and D's drift is inherently
#                           slow, so the 200-step EMA lag displacement
#                           is <1% of the remaining D path)
#   ANCHOR_B1       0.5    (no momentum adventure after phase 2)
#   ANCHOR_UPDATES  8      (new --anchor-updates: 8 anchor Adam steps
#                           per GAN step; ~Kx ridge progress at
#                           ~(6+K)/7x step cost — mm13fix's measured
#                           0.2%/1k at lr 1e-3 scales to ~3%/1k GAN
#                           steps at 2e-3 x 8 updates -> gate in ~6k
#                           steps if the linear estimate holds, ~19k
#                           even at 3x pessimism)
#
# Phase 5 (2026-08-19 ~02:45 UTC): the sandbox VM was recycled between
# builder sessions and runs/ (gitignored checkpoints) did not survive —
# rec13anchor3's phase-4 state is gone. COLD RESTART from the standard
# +30%/-30% ridge start as runs/rec13anchor4, using the phase-4-proven
# per-update dynamics from step 0:
#   ANCHOR 1e-3, ANCHOR_EMA 0.995, ANCHOR_B1 0.5, ANCHOR_UPDATES 8
# Rationale: each anchor update then has EXACTLY mm13fix's convergent
# per-update dynamics (lr 1e-3, gamma 0.995), 8 per GAN step — mm13fix
# recovered from THIS cold start in 96k updates, i.e. ~12k GAN steps
# here; phase 4 measured J -4.5%/1k and D -1.6%/1k at this config, so
# the D path (30% -> 7%) forecasts ~12-14.5k steps at the measured
# ~1.9 s/step (6.3-7.6 h). K=8 keeps the EMA lag at 25 GAN steps, 8x
# tighter than the round-3 limit-cycle regime, so full cold-start gen
# lr (1e-4) is inside the measured stability region.
#
# Phase 5b (2026-08-19 04:25 UTC): the VM recycled AGAIN before phase 5
# could launch (boot 04:14; the 02:45 session's window evaporated).
# Same plan, same RUN name (runs/ is empty — nothing to collide with),
# deadlines shifted to the new ~12h session window ending ~16:20 UTC.
#
# All times UTC. Round-4c builder session ends ~16:20 Aug 19; margins:
#   STOP_AT   13:45 — stop a RUNNING flagship (leaves eval-queue room)
#   LAST_CALL 14:15 — absolute flagship stop
#   END_AT    15:00 — hard end for queue TPU work (driver bench after)
# Phase 6 (11:55 UTC): anchor ENDGAME. At step ~15.7k the run sits in a
# bounded anti-phase J/D cycle (J 9.9 +/- 0.4%, D 5.0 +/- 0.4%) — the
# measured anchor/critic force balance (anchor_equilibrium_probe.json:
# the critic's pull is 90x weaker than the anchor's and pure tax at
# this point; its lr schedule already cools it 2x every 12k steps).
# The endgame finishes what the schedule does asymptotically: resume
# with the ADVERSARIAL generator lr zeroed (GEN_LR 1e-8) while the
# anchor (K=8 x 1e-3, gamma 0.995 — mm13fix's proven-stable endgame
# dynamics) carries the final descent. Same run, same CLI, recorded in
# info.json on resume; the learning curve shows the phase boundary.
# Phase 6c (13:10 UTC): 6b OUTCOME — gamma 0.9's fast drift raced the
# ridge: J crushed 10.7 -> 6.5% but the exchange pushed D 5.4 -> 13.3%
# (at gamma 0.9 D's restoring signal is below the EMA noise floor, so
# nothing held it — the starvation cost was NOT moot off-equilibrium).
# Orbax retention had deleted the phase-5 ckpt, so the honest path is
# forward: resume the 6b endpoint at the PROVEN gamma 0.995 — at D 13%
# the anchor's restoring force is strong (it drove D 30 -> 5% in phase
# 5), and the reverse exchange is lossy in our favor (6b bought J -4.2%
# for D +7.9%; the 0.995 reversal at phase-4's measured rates descends
# D ~1.5-2%/1k while J gives back less than half) — forecast: both
# J,D <= 9% within ~3-4k steps, gate tiers 9.5/9.99 already active.
#
# Phase 6b (12:30 UTC): the orbit is ANCHOR-INTERNAL — 2k critic-free
# steps at gamma 0.995 still orbit (J center 10.12 -> 9.91 -> 10.29 over
# 16k-18.9k). The run family's own history has the measured fix: gamma
# 0.9 killed exactly this lag cycle and descended J steadily
# (rec13anchor3 phase 1: 25.9% -> 6.9% at 0.7-1%/1k). Its known cost —
# D-signal starvation — is moot in the endgame: D is already AT ~5.2%
# and only needs to hold. At K=8 the lag is ~1 GAN step; per-update lr
# stays at the proven 1e-3.
RUN=${RUN:-rec13anchor4}
GEN_LR=${GEN_LR:-1e-8}
PIDFILE=${PIDFILE:-/tmp/${RUN}.pid}
STOPFILE=${STOPFILE:-/tmp/${RUN}.stopped}   # queue drops this on ANY intentional stop
# Watchdog touches this BEFORE killing/relaunching a wedged or crashed
# flagship and removes it once the new pid is in $PIDFILE, so the queue
# never mistakes the dead-pid window mid-resume for "flagship finished"
# (that exact race fired at 07:30 on 2026-08-19: queue saw the hang-kill,
# dropped $STOPFILE, and started the eval chain at step 3877).
RESUMEFILE=${RESUMEFILE:-/tmp/${RUN}.resuming}
# A resume sentinel older than this is stale (watchdog died mid-resume);
# the queue stops honoring it rather than waiting forever.
RESUME_FRESH_S=${RESUME_FRESH_S:-900}
resume_pending() {
  [ -f "$RESUMEFILE" ] || return 1
  age=$(( $(date -u +%s) - $(stat -c %Y "$RESUMEFILE") ))
  [ "$age" -le "$RESUME_FRESH_S" ]
}
# 10:40 revision: STOP_AT moved 13:45 -> 12:50. The mm-ensemble queue
# item requires >=6000 s before END_AT at its launch (i.e. start by
# ~13:20, after the ~25-min eval chain), so a flagship polishing until
# 13:45 would silently forfeit mmens13 for a marginal gain (J ~9.2% at
# 12:50 vs ~8.8% projected at 13:45 — both pass the 10% bar).
# 11:10 re-balance: J is plateauing at ~10% while D finishes its ridge
# ascent; the post-settle J descent needs steps, and the step rate
# dropped back to ~1.5 s/step. STOP_AT 12:50 -> 13:25, funded by
# cutting the mm-ensemble's launch threshold instead of dropping it
# (run.ensemble is preemption-safe now — a truncated run still writes
# its summary).
STOP_AT=${STOP_AT:-$(date -u -d "2026-08-19 14:05" +%s)}
LAST_CALL=${LAST_CALL:-$(date -u -d "2026-08-19 14:15" +%s)}
END_AT=${END_AT:-$(date -u -d "2026-08-19 15:00" +%s)}
export GATE_STEP=${GATE_STEP:-8000}
N_STEPS=${N_STEPS:-60000}
ANCHOR=${ANCHOR:-1e-3}
ANCHOR_EMA=${ANCHOR_EMA:-0.995} # phase 6c: restore the proven window (see header)
ANCHOR_B1=${ANCHOR_B1:-0.5}
ANCHOR_UPDATES=${ANCHOR_UPDATES:-8}

last_step() {
  tail -1 "runs/$RUN/generator.csv" 2>/dev/null | cut -d, -f1
}

# J,D below the gate (mean over the 4 block entries) across a 1000-step
# window past GATE_STEP. Identical check for queue and watchdog BY
# CONSTRUCTION (both call this function), so a gate stop is never
# mistaken for a crash even without the sentinel.
#
# Two-tier threshold: strict 7% while there is chip time to spare; after
# RELAX_AT, 9.5% — still under the round's 10% bar — so a run hovering
# at 8-9% stops in time for the eval chain AND the queued mm-ensemble
# science run (needs ~110 min before END_AT) instead of polishing until
# STOP_AT and squeezing both out.
# 11:15 retiming: J turned and is descending (~-0.2..-0.5%/1k) with D
# settled — every extra minute now BUYS headline quality, and the
# mm-ensemble is already funded by the 3000 s threshold. The relaxed
# tiers are end-of-window backstops, not early exits: strict 7% (a
# dream outcome stops immediately) until 13:00, 9.5% from 13:00, 9.99%
# from 13:10, deadline 13:25.
RELAX_AT=${RELAX_AT:-$(date -u -d "2026-08-19 13:50" +%s)}
RELAX2_AT=${RELAX2_AT:-$(date -u -d "2026-08-19 13:58" +%s)}
# Delegates to the first-class gate CLI (tcgan_tpu.analysis.recovery_gate)
# instead of an inline re-implementation: one gate, truth loaded from the
# run's own info.json, window measured in STEPS via the actual step
# column (duplicate rows / thinned cadence cannot skew it). Exit 2
# (missing truth) counts as not-cleared, which is the safe direction.
gate_cleared() {
  now_s=$(date -u +%s)
  if [ "$now_s" -ge "$RELAX2_AT" ]; then GATE_PCT=0.0999
  elif [ "$now_s" -ge "$RELAX_AT" ]; then GATE_PCT=0.095
  else GATE_PCT=0.07; fi
  python -m tcgan_tpu.analysis.recovery_gate "runs/$RUN" \
    --gate "$GATE_PCT" --min-step "$GATE_STEP" --window 1000 --quiet
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
    --anchor-beta1 "$ANCHOR_B1" --anchor-updates "$ANCHOR_UPDATES" \
    --gen-learn-rate "$GEN_LR" --disc-learn-rate 1e-3 \
    --critic-lr-decay-steps 0 --lr-decay-steps 12000 \
    --gen-ema 0.999 --clip-grad 1.0 \
    --solver-backend pallas --checkpoint-every 1000 --timing-every 500
}
