"""Summarize the drift-latch live validation run (runs/driftlatch5).

Pre-registered readout (launch_driftlatch5.sh): the latch must not fire
while D is still directionally descending; late-or-never firing is the
safe side. Emits one JSON (docs/artifacts/driftlatch5_summary.json):
per-family error trajectory, the drift_ratio trace, the latch fire step
(first armed drift_ratio < threshold — the latch is one-way, so first
crossing = fire), and the D descent slope in the 500 steps before the
fire, which is the premature-freeze verdict.

Usage:  python docs/artifacts/driftlatch5_analyze.py [runs/driftlatch5]
"""

import csv
import json
import sys

import numpy as np

run = sys.argv[1] if len(sys.argv) > 1 else "runs/driftlatch5"
ARM, THRESH = 400, 0.4
TJ = np.array([0.045, 0.04, 0.05, 0.035])
TD = np.array([0.1, 0.08, 0.1, 0.08])
TS = np.array([0.25, 0.1, 0.25, 0.1])

rows = list(csv.reader(open(f"{run}/generator.csv")))
data = np.array(rows[1:], dtype=float)
data = data[np.argsort(data[:, 0], kind="stable")]
data = data[np.append(data[1:, 0] != data[:-1, 0], True)]
step = data[:, 0]
eJ = np.abs(data[:, 1:5] / TJ - 1).mean(1) * 100
eD = np.abs(data[:, 5:9] / TD - 1).mean(1) * 100
eS = np.abs(data[:, 9:13] / TS - 1).mean(1) * 100

lstep, lratio = [], []
with open(f"{run}/learning.jsonl") as f:
    for line in f:
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if r.get("drift_ratio") is not None:
            lstep.append(r["step"])
            lratio.append(r["drift_ratio"])
lstep, lratio = np.array(lstep), np.array(lratio)

armed = lstep >= ARM
fire = None
if armed.any():
    below = armed & (lratio < THRESH)
    if below.any():
        fire = int(lstep[below][0])


def err_at(s):
    i = np.searchsorted(step, s)
    i = min(i, len(step) - 1)
    return dict(step=int(step[i]), J=round(float(eJ[i]), 2),
                D=round(float(eD[i]), 2), S=round(float(eS[i]), 2))


def slope_per_1k(e, lo, hi):
    m = (step >= lo) & (step <= hi)
    if m.sum() < 2:
        return None
    return round(float(np.polyfit(step[m], e[m], 1)[0] * 1000), 3)


traj = [err_at(s) for s in range(0, int(step[-1]) + 1, 500)]
win = [(int(s), round(float(np.median(lratio[(lstep >= s) &
                                             (lstep < s + 500)])), 3))
       for s in range(0, int(lstep[-1]) + 1, 500)
       if ((lstep >= s) & (lstep < s + 500)).any()]

out = dict(
    run=run, arm_step=ARM, threshold=THRESH,
    last_step=int(step[-1]),
    trajectory=traj,
    drift_ratio_median_per_500=win,
    fired_at=fire,
    d_slope_500_before_fire_pct_per_1k=(
        slope_per_1k(eD, fire - 500, fire) if fire else None),
    d_err_at_fire=(err_at(fire)["D"] if fire else None),
    d_slope_overall_pct_per_1k=slope_per_1k(eD, 0, step[-1]),
    end=err_at(step[-1]),
)
# The verdict: a fire counts as premature iff D was still descending
# faster than the orbit-noise scale (|slope| > 1%/1k, the flagship's
# measured descent was ~ -2%/1k) in its trailing 500-step window.
sl = out["d_slope_500_before_fire_pct_per_1k"]
out["premature_freeze"] = bool(fire is not None and sl is not None
                               and sl < -1.0)
out["verdict"] = (
    "LATCH SAFE: never fired (degenerates to gamma 0.995)" if fire is None
    else ("DEFECT: fired mid-descent" if out["premature_freeze"]
          else f"LATCH SAFE: fired at {fire} after D's descent stalled"))

# Counterfactual: the velocity detector (--anchor-ema-switch-vel,
# built from this run's measurements) evaluated offline on the same
# trace — debiased EMA (gamma 0.999) of the per-step log-param deltas,
# max over components, in %-per-1k-steps. The claim it must support:
# at the ratio-latch's fire step the velocity statistic is far ABOVE
# the 1.0 threshold (it sees the descent the ratio cannot).
L = np.log(data[:, 1:13])
dL = np.diff(L, axis=0)
g = 0.999
e = np.zeros(12)
vel = [np.nan]
for t in range(dL.shape[0]):
    e = g * e + (1 - g) * dL[t]
    vel.append(np.max(np.abs(e / (1 - g ** (t + 1)))) * 1e5)
vel = np.array(vel)
out["vel_stat_pct_per_1k"] = {
    "at_fire": (round(float(vel[np.searchsorted(step, fire)]), 2)
                if fire else None),
    "per_250": [(int(s), round(float(np.nanmedian(
        vel[(step >= s) & (step < s + 250)])), 2))
        for s in range(0, int(step[-1]) + 1, 250)],
    "would_hold_at_fire": (bool(vel[np.searchsorted(step, fire)] > 1.0)
                           if fire else None),
}

path = "docs/artifacts/driftlatch5_summary.json"
json.dump(out, open(path, "w"), indent=1)
print(json.dumps(out, indent=1))
