"""Round-3 kernel-bound probe (VERDICT r2 #3): what binds the rows kernel?

Hypothesis from round-1/2 measurements: per-substep cost is ~independent of
the matmul M dimension (stim rows) up to the MXU height — i.e. the kernel
is bound by MXU weight-load/pipeline-fill, which each tile pays ONCE PER
CIRCUIT-SUBSTEP but amortizes over only s_pad=8 stim rows. If so,
stim-solves/s should grow ~linearly with the battery size at fixed circuit
count, and the 8-stim headline is near speed-of-light for its shape.

Run on the real chip: python docs/artifacts/kernel_probe.py
"""

import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp

# Repo root on sys.path AFTER jax import: putting it on PYTHONPATH breaks
# the axon TPU plugin's entry-point discovery in this sandbox.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"))

from tcgan_tpu.ops import stimulus, weights
from tcgan_tpu.ops.pallas import solve_fixed_point_pallas
from tcgan_tpu.ops.ssn import SSNConfig


def main():
    cfg = SSNConfig(N=51, k=0.01, n=2.2, dt=0.0005, max_iter=8000, atol=1e-4)
    J = jnp.array([[0.045, 0.040], [0.050, 0.035]])
    D = jnp.array([[0.10, 0.08], [0.10, 0.08]])
    S = jnp.array([[0.25, 0.10], [0.25, 0.10]])
    x = cfg.site_pos()
    B = 512
    REPS = 5
    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.PRNGKey(0)
    z = weights.sample_z(key, (B,), cfg.N)
    W = weights.build_weight(J, D, S, z, x)

    base_bw = (0.0, 0.0625, 0.125, 0.1875, 0.25, 0.5, 0.75, 1.0)

    results = {}
    # 1) M-scaling: replicate the battery to s_pad = 8..128 stim rows.
    for rep in (1, 2, 3, 4, 8, 16):
        bws = tuple(b + 1e-4 * i for i in range(rep) for b in base_bw)
        I_ext = stimulus.stimulus_battery(bws, (10.0,), x, cfg.smoothness)
        S_cond = I_ext.shape[0]
        # Tile VMEM footprint scales with block_b * s_pad: shrink the
        # circuit tile as the battery grows to stay inside scoped vmem.
        bb = 16 if S_cond <= 32 else (8 if S_cond <= 64 else 4)
        solve = jax.jit(lambda w, I=I_ext, b=bb: solve_fixed_point_pallas(
            cfg, w, I, block_b=b, check_every=32, two_phase=True,
            refine=True, interpret=not on_tpu))
        r = solve(W)
        jax.block_until_ready(r.r)
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = solve(W)
        jax.block_until_ready(r.r)
        t = (time.perf_counter() - t0) / REPS
        results[f"m_scaling_s{S_cond}"] = {
            "stim_solves_per_s": round(B * S_cond / t, 1),
            "batches_per_s": round(B / t, 2),
            "mean_iters": round(float(r.iters.mean()), 1),
            "frac_conv": round(float(r.converged.mean()), 4),
        }
        print(f"s_pad={S_cond}: {B * S_cond / t:,.0f} stim-solves/s "
              f"({B / t:,.0f} circuit-batches/s, iters "
              f"{float(r.iters.mean()):.0f})", flush=True)

    # 2) block_b scan at the bench battery (straggler/tile-size tradeoff).
    I_ext = stimulus.stimulus_battery(base_bw, (10.0,), x, cfg.smoothness)
    for bb in (4, 8, 16, 32):
        solve = jax.jit(lambda w, b=bb: solve_fixed_point_pallas(
            cfg, w, I_ext, block_b=b, check_every=32, two_phase=True,
            refine=True, interpret=not on_tpu))
        r = solve(W)
        jax.block_until_ready(r.r)
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = solve(W)
        jax.block_until_ready(r.r)
        t = (time.perf_counter() - t0) / REPS
        results[f"block_b_{bb}"] = round(B * 8 / t, 1)
        print(f"block_b={bb}: {B * 8 / t:,.0f} solves/s", flush=True)

    # 3) check_every scan (chunk overhead vs wasted iterations).
    for ce in (16, 32, 64, 128):
        solve = jax.jit(lambda w, c=ce: solve_fixed_point_pallas(
            cfg, w, I_ext, block_b=16, check_every=c, two_phase=True,
            refine=True, interpret=not on_tpu))
        r = solve(W)
        jax.block_until_ready(r.r)
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = solve(W)
        jax.block_until_ready(r.r)
        t = (time.perf_counter() - t0) / REPS
        results[f"check_every_{ce}"] = {
            "solves_per_s": round(B * 8 / t, 1),
            "mean_iters": round(float(r.iters.mean()), 1)}
        print(f"check_every={ce}: {B * 8 / t:,.0f} solves/s "
              f"(iters {float(r.iters.mean()):.0f})", flush=True)

    out = pathlib.Path(__file__).with_name("kernel_probe_results.json")
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
