"""Anchor-lr scaling study (CPU, tiny battery): validate the adaptive
flagship launcher's recipe assumptions.

The launcher (launch_rec13anchor2_adaptive.sh) picks the composed-Adam
anchor learning rate from remaining chip time using two scaling claims
inherited from a single mm13fix datapoint:

  (1) steps-to-reach-a-gate  ~ 1/lr   (descent speed linear in lr)
  (2) settled (plateau) error ~ sqrt(lr)  (Adam's noise-ball radius)

This script measures both on the identifiable tiny battery the GAN fence
uses (tests/test_gan_recovery_slow.py — same circuit, offset, and hybrid
objective; N=8, f64, IFT solver, CPU), sweeping the anchor lr over a
16x range with multiple seeds. Pure CPU — safe to run while a chip job
is live. Writes anchor_lr_scaling.json next to this file.

Usage: python docs/artifacts/anchor_lr_scaling.py [--steps 600]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from tcgan_tpu.data.datasets import generate_fake_truth  # noqa: E402
from tcgan_tpu.models import generator as gen_lib  # noqa: E402
from tcgan_tpu.models import wgan as wgan_lib  # noqa: E402
from tcgan_tpu.models.generator import GeneratorConfig  # noqa: E402
from tcgan_tpu.models.moments import data_moments  # noqa: E402
from tcgan_tpu.ops.ssn import SSNConfig  # noqa: E402

GEN = GeneratorConfig(
    ssn=SSNConfig(N=8, k=0.01, n=2.0, dt=0.0005, max_iter=8000, atol=1e-6),
    bandwidths=(0.25, 0.5, 1.0),
    contrasts=(20.0,),
    sample_sites=1,
    solver="ift",
    dtype=jnp.float64,
)
TRUE_J = ((0.30, 0.27), (0.30, 0.21))
TRUE_D = ((0.05, 0.04), (0.05, 0.04))
TRUE_S = ((0.25, 0.1), (0.25, 0.1))

LRS = (1.25e-2, 2.5e-2, 5e-2, 1e-1, 2e-1)
SEEDS = (0, 1)


def run_one(lr: float, seed: int, n_steps: int, data) -> dict:
    cfg = wgan_lib.WGANConfig(
        gen=GEN, critic_layers=(32, 32), batch_size=64,
        n_critic=2, n_critic0=10, lr_gen=1e-3, lr_critic=1e-3,
        clip_grad=1.0, rate_cost=0.0, seed=seed,
        moment_anchor=lr, moment_ema=0.9,
    )
    true_params = gen_lib.init_params(GEN, TRUE_J, TRUE_D, TRUE_S)
    start = {"J": true_params["J"] + 0.3,
             "D": true_params["D"], "S": true_params["S"]}
    state = wgan_lib.init_state(
        cfg, gen_init=jax.tree.map(jnp.copy, start),
        data_moments=data_moments(data))

    def j_err(params):
        J, _, _ = gen_lib.param_values_np(GEN, params)
        return float(np.abs(J - np.asarray(TRUE_J)).mean())

    err0 = j_err(state.gen_params)
    key = jax.random.PRNGKey(seed)
    n_data = data.shape[0]
    errs = []
    for step in range(n_steps):
        key, k_data, k_step = jax.random.split(key, 3)
        n_critic = cfg.n_critic0 if step == 0 else cfg.n_critic
        idx = jax.random.randint(k_data, (n_critic, cfg.critic_batch),
                                 0, n_data)
        state, m = wgan_lib.train_step(cfg, n_critic, state, data[idx],
                                       k_step)
        if not np.isfinite(float(m.g_loss)):
            return {"lr": lr, "seed": seed, "failed_at": step}
        if step % 5 == 0:
            errs.append(j_err(state.gen_params))
    errs = np.asarray(errs)
    steps_axis = 5 * np.arange(len(errs))
    half = np.nonzero(errs <= 0.5 * err0)[0]
    return {
        "lr": lr,
        "seed": seed,
        "err_start": err0,
        # plateau error: median of the last 25% of the trajectory — robust
        # to late single-step adversarial kicks at this tiny batch
        "err_settled": float(np.median(errs[-max(1, len(errs) // 4):])),
        "err_best": float(errs.min()),
        "steps_to_half": int(steps_axis[half[0]]) if half.size else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    args = ap.parse_args()

    data = jnp.asarray(generate_fake_truth(
        GEN, TRUE_J, TRUE_D, TRUE_S, num_samples=512, batch=128, seed=1))

    out = {"n_steps": args.steps, "lrs": list(LRS), "seeds": list(SEEDS),
           "runs": []}
    for lr in LRS:
        for seed in SEEDS:
            t0 = time.time()
            r = run_one(lr, seed, args.steps, data)
            r["wall_s"] = round(time.time() - t0, 1)
            out["runs"].append(r)
            print(json.dumps(r), flush=True)

    # scaling fits (log-log slope), over seed-median per lr
    ok = [r for r in out["runs"] if "err_settled" in r]
    by_lr = {}
    for r in ok:
        by_lr.setdefault(r["lr"], []).append(r)
    lrs, settled, to_half = [], [], []
    for lr, rs in sorted(by_lr.items()):
        lrs.append(lr)
        settled.append(float(np.median([r["err_settled"] for r in rs])))
        halves = [r["steps_to_half"] for r in rs
                  if r["steps_to_half"] is not None]
        to_half.append(float(np.median(halves)) if halves else None)
    if len(lrs) >= 3:
        out["settle_loglog_slope"] = float(np.polyfit(
            np.log(lrs), np.log(settled), 1)[0])
        pairs = [(l, h) for l, h in zip(lrs, to_half)
                 if h is not None and h > 0]
        if len(pairs) >= 3:
            out["halftime_loglog_slope"] = float(np.polyfit(
                np.log([p[0] for p in pairs]),
                np.log([p[1] for p in pairs]), 1)[0])
    out["claims"] = {
        "settle_expected_slope": 0.5,
        "halftime_expected_slope": -1.0,
    }
    path = pathlib.Path(__file__).with_suffix(".json")
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
