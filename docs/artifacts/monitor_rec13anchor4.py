"""One-line flagship status: J/D/S errors, slopes, health, ETA to gate.

Usage:  python docs/artifacts/monitor_rec13anchor4.py [runs/rec13anchor4]
"""

import csv
import json
import sys

import numpy as np

run = sys.argv[1] if len(sys.argv) > 1 else "runs/rec13anchor4"
TJ = np.array([0.045, 0.04, 0.05, 0.035])
TD = np.array([0.1, 0.08, 0.1, 0.08])
TS = np.array([0.25, 0.1, 0.25, 0.1])

rows = list(csv.reader(open(f"{run}/generator.csv")))
data = np.array(rows[1:], dtype=float)
# keep-LAST row per step (stable sort preserves file order within equal
# steps): survivor-lineage view during the 07:31 dual-writer overlap
# window — see rec13anchor4_incident_0731.md
data = data[np.argsort(data[:, 0], kind="stable")]
data = data[np.append(data[1:, 0] != data[:-1, 0], True)]
step = data[:, 0]
eJ = np.abs(data[:, 1:5] / TJ - 1).mean(1) * 100
eD = np.abs(data[:, 5:9] / TD - 1).mean(1) * 100
eS = np.abs(data[:, 9:13] / TS - 1).mean(1) * 100

s = int(step[-1])
msg = f"step {s}: J {eJ[-1]:.1f}%  D {eD[-1]:.1f}%  S {eS[-1]:.1f}%"
w = step >= step[-1] - 1000
if w.sum() > 10 and step[-1] > 1000:
    span = (step[w][-1] - step[w][0]) / 1000
    dJ = (eJ[w][-1] - eJ[w][0]) / span
    dD = (eD[w][-1] - eD[w][0]) / span
    msg += f"  |  slope/1k: J {dJ:+.2f}%  D {dD:+.2f}%"
    if dD < -0.05:
        eta = (eD[-1] - 7.0) / -dD
        msg += f"  |  D->7%: +{eta:.1f}k steps"

try:
    health = [json.loads(x) for x in open(f"{run}/learning.jsonl")][-1]
    msg += (f"  |  conv {health['frac_converged']:.2f} "
            f"yield {health.get('circuit_yield', float('nan')):.2f} "
            f"anchor {health.get('anchor_residual', float('nan')):.1e} "
            f"dacc {health['d_accuracy']:.2f} "
            f"{health['train_time']:.2f}s/step")
except Exception:
    pass
print(msg)
