"""Figure for the round-3 discriminability-vs-scale probe
(ridge_discrimination_scale.py; data in ridge_discrimination_scale.json).

Two panels (one per ridge displacement), held-out probe accuracy vs
truth-dataset size M, two series: the joint whitened 192-dim input vs the
cWGAN's per-condition row input. Chance = 0.5 reference line; joint seeds
shown as small open markers around the seed-median line.

Usage: python docs/artifacts/ridge_discrimination_scale_fig.py
Writes: docs/artifacts/ridge_discrimination_scale.png
"""

import json
import pathlib

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
DATA = json.load(open(HERE / "ridge_discrimination_scale.json"))

MS = [4096, 16384, 65536, 262144]
# categorical slots 1 (blue) + 2 (orange), light mode — fixed order
C_JOINT = "#2a78d6"
C_ROWS = "#eb6834"
INK = "#1a1a19"
INK2 = "#52514e"
GRID = "#e5e4e0"


def series(disp, kind):
    med, seeds = [], []
    for m in MS:
        cell = DATA[f"{kind}_{disp}_m{m}"]
        acc = sorted(cell["acc_seeds"])
        med.append(acc[len(acc) // 2])
        seeds.append(cell["acc_seeds"])
    return np.array(med), seeds


def main():
    fig, axes = plt.subplots(1, 2, figsize=(9.0, 3.6), sharey=True)
    titles = {"stall": "stall displacement (J +37%)",
              "mid": "mid displacement (J ~ +17%)"}
    for ax, disp in zip(axes, ("stall", "mid")):
        ax.axhline(0.5, color=INK2, lw=1.0, ls=(0, (4, 3)), zorder=1)
        for kind, color, label in (("joint", C_JOINT, "joint, whitened"),
                                   ("row", C_ROWS, "per-condition rows")):
            med, seeds = series(disp, kind)
            ax.plot(MS, med, color=color, lw=2, zorder=3,
                    marker="o", ms=5, label=label)
            for m, accs in zip(MS, seeds):
                if len(accs) > 1:
                    ax.plot([m] * len(accs), accs, ls="none", marker="o",
                            ms=3.5, mfc="none", mec=color, mew=1.0,
                            alpha=0.6, zorder=2)
        ax.set_xscale("log", base=2)
        ax.set_xticks(MS)
        ax.set_xticklabels(["4k", "16k", "64k", "262k"])
        ax.set_title(titles[disp], fontsize=10, color=INK)
        ax.set_xlabel("truth samples per side (M)", fontsize=9, color=INK2)
        ax.tick_params(colors=INK2, labelsize=8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.grid(axis="y", color=GRID, lw=0.7)
        ax.set_axisbelow(True)
    axes[0].set_ylabel("held-out probe accuracy", fontsize=9, color=INK2)
    axes[0].set_ylim(0.46, 0.58)
    axes[0].annotate("chance", xy=(MS[0], 0.5), xytext=(MS[0], 0.487),
                     fontsize=8, color=INK2)
    axes[0].legend(loc="upper left", fontsize=8, frameon=False,
                   labelcolor=INK)
    fig.suptitle("Ridge discriminability vs dataset scale: whitening "
                 "exposes the stall point; per-condition rows stay blind; "
                 "the mid-point is invisible at any M",
                 fontsize=10, color=INK, y=1.02)
    fig.tight_layout()
    out = HERE / "ridge_discrimination_scale.png"
    fig.savefig(out, dpi=160, bbox_inches="tight", facecolor="white")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
