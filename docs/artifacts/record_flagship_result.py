"""Render the flagship-result markdown block for BASELINE.md.

Collects, for a completed (c)WGAN/hybrid run: tail-averaged J/D/S
recovery errors from generator.csv, W1-family metrics from the queue's
eval JSON, and the calibration verdict from the uncertainty JSON —
and prints a BASELINE-ready markdown section. Pure host-side.

Usage:
  python docs/artifacts/record_flagship_result.py \
      --run runs/rec13anchor3 --eval /tmp/rec13anchor3_eval.json \
      --uncertainty docs/artifacts/rec13anchor3_uncertainty.json \
      [--tail 2000]
"""

from __future__ import annotations

import argparse
import csv
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/rec13anchor3")
    ap.add_argument("--eval", default="/tmp/rec13anchor3_eval.json")
    ap.add_argument("--uncertainty",
                    default="docs/artifacts/rec13anchor3_uncertainty.json")
    ap.add_argument("--tail", type=int, default=2000,
                    help="steps to tail-average generator params over")
    args = ap.parse_args()

    info = json.load(open(f"{args.run}/info.json"))["config"]
    truth = {k: np.array(info[f"true_{k}"], dtype=float)
             for k in ("J", "D", "S")}

    rows = list(csv.reader(open(f"{args.run}/generator.csv")))
    data = np.array(rows[1:], dtype=float)
    data = data[np.argsort(data[:, 0])]
    last_step = int(data[-1, 0])
    tail = data[data[:, 0] >= last_step - args.tail]
    avg = tail[:, 1:13].mean(0)
    endpoint = data[-1, 1:13]

    def errs(vec):
        out = {}
        for i, k in enumerate(("J", "D", "S")):
            e = np.abs(vec[4 * i:4 * i + 4] - truth[k]) / truth[k] * 100
            out[k] = (float(e.mean()), float(e.max()))
        return out

    e_tail, e_end = errs(avg), errs(endpoint)
    print(f"**Flagship result ({args.run}, endpoint step {last_step}; "
          f"tail-averaged over the last {args.tail} steps):**\n")
    print("| block | tail-avg err (mean / max) | endpoint err (mean) |")
    print("|---|---|---|")
    for k in ("J", "D", "S"):
        print(f"| **{k}** | **{e_tail[k][0]:.1f}% / {e_tail[k][1]:.1f}%** "
              f"| {e_end[k][0]:.1f}% |")
    print()
    print("Tail-averaged params:")
    for i, k in enumerate(("J", "D", "S")):
        vals = ", ".join(f"{v:.4f}" for v in avg[4 * i:4 * i + 4])
        tv = ", ".join(f"{v:.3f}" for v in truth[k])
        print(f"  {k}: [{vals}]  (truth [{tv}])")
    print()

    try:
        ev = json.load(open(args.eval))
        print(f"Eval ({ev.get('n_gen', '?')} gen vs {ev.get('n_data', '?')} "
              f"data samples): tc_w1 {ev.get('tc_w1'):.4f}, sliced_w1 "
              f"{ev.get('sliced_w1'):.4f}, frac_converged "
              f"{ev.get('frac_converged'):.3f}")
    except Exception as e:  # noqa: BLE001
        print(f"(eval JSON unavailable: {e})")
    try:
        unc = json.load(open(args.uncertainty))
        v = unc.get("verdict") or unc.get("calibration", {}).get("verdict")
        print(f"Uncertainty verdict: {v}")
    except Exception as e:  # noqa: BLE001
        print(f"(uncertainty JSON unavailable: {e})")


if __name__ == "__main__":
    main()
