"""Fused SSN fixed-point solver as a Pallas TPU kernel.

Why a kernel (measured on TPU v5e, see BENCH notes): the plain-XLA
while-loop solver re-streams every circuit's (2N x 2N) weight matrix from
HBM on every Euler iteration — at batch 256/N=51 that is ~10 MB x ~35k
iters/s ≈ HBM speed-of-light, and the whole batch runs in lockstep until
the LAST sample resolves. This kernel:

- grids over tiles of ``block_b`` circuits; each tile's weights are loaded
  into VMEM ONCE and stay resident across all Euler iterations (HBM
  traffic drops from O(iters x W) to O(W));
- runs its own `lax.while_loop` per tile, so a tile whose circuits all
  converge/diverge early STOPS early (per-tile early exit — the TPU
  equivalent of the reference C solver's per-sample early exit, which
  lockstep XLA cannot express);
- fuses the io nonlinearity, the Euler update, the convergence residual
  and the divergence ceiling into the matmul's epilogue (VPU ops between
  MXU passes, no intermediate HBM round-trips).

Semantics are bit-compatible in structure with
:func:`tcgan_tpu.ops.fixed_point.solve_fixed_point` (same residual
criterion, same flags; cross-checked by tests/test_pallas_solver.py — the
reference's cross-implementation pattern, SURVEY.md §4).

Reference parity: tc_gan/ext/ (OpenMP C batch Euler solver).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcgan_tpu.ops.fixed_point import FixedPointResult
from tcgan_tpu.ops.ssn import SSNConfig

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _io_fns(cfg: SSNConfig):
    """Closed-form io function with overflow guards, safe inside kernels."""
    k, n, r0, r1 = cfg.k, cfg.n, cfg.rate_soft_bound, cfg.rate_hard_bound

    def power(u):
        up = jnp.maximum(u, 0.0)
        # exp/log form keeps Mosaic happy for non-integer n; guard log(0)
        fp = jnp.exp(n * jnp.log(jnp.maximum(up, 1e-30))) * k
        return jnp.where(up > 0.0, fp, 0.0)

    if cfg.io_type == "asym_power":
        return power
    if cfg.io_type == "asym_tanh":
        d = r1 - r0

        def tanh_io(u):
            fp = power(u)
            arg = jnp.clip(jnp.maximum(fp - r0, 0.0) / d, 0.0, 30.0)
            return jnp.where(fp <= r0, fp, r0 + d * jnp.tanh(arg))

        return tanh_io
    if cfg.io_type == "asym_linear":
        u0 = float(np.power(r0 / k, 1.0 / n))
        slope = k * n * float(np.power(u0, n - 1.0))

        def linear_io(u):
            fp = power(u)
            return jnp.where(u <= u0, fp, r0 + slope * (u - u0))

        return linear_io
    raise ValueError(cfg.io_type)


def _solver_kernel(cfg: SSNConfig, block_b: int, s_pad: int, n_pad: int,
                   check_every: int,
                   W_ref, I_ref, dtau_ref, r_ref, conv_ref, div_ref,
                   iters_ref):
    f = _io_fns(cfg)
    W = W_ref[:]  # (block_b, n_pad, n_pad), resident in VMEM
    I = I_ref[:]  # (s_pad, n_pad)
    dtau = dtau_ref[:]  # (1, n_pad)

    def drive(r):
        # u[b] = r[b] @ W[b]^T + I  — one MXU matmul per circuit in the tile
        # (static unroll; batched dot_general is not reliably lowered).
        outs = [
            jax.lax.dot_general(
                r[b], W[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for b in range(block_b)
        ]
        return jnp.stack(outs, axis=0) + I[None]

    # Masks are carried as 0/1 float32 throughout: Mosaic cannot reshape
    # 1-bit (i1) vectors to higher rank, so the masked Euler update uses
    # arithmetic (r += active * dtau * delta) instead of jnp.where on bools.
    def substep(r, active3):
        u = drive(r)
        delta = -r + f(u)
        return r + active3 * (dtau[None] * delta), delta

    class S(NamedTuple):
        it: jnp.ndarray
        r: jnp.ndarray
        conv: jnp.ndarray  # (block_b, s_pad) f32 0/1
        div: jnp.ndarray  # f32 0/1
        iters: jnp.ndarray  # f32 (cast to i32 on write-out)

    def cond(s: S):
        n_resolved = jnp.sum(s.conv) + jnp.sum(s.div)
        return (s.it < cfg.max_iter) & (n_resolved < block_b * s_pad - 0.5)

    def body(s: S):
        active = 1.0 - s.conv - s.div  # f32 0/1
        active3 = active[:, :, None]
        r = s.r
        for _ in range(check_every - 1):
            r, _ = substep(r, active3)
        r, delta = substep(r, active3)
        err = jnp.max(jnp.abs(delta), axis=-1)  # (block_b, s_pad)
        peak = jnp.max(r, axis=-1)
        it_next = s.it + check_every
        div_hit = jnp.where(peak > cfg.rate_stop_at, 1.0, 0.0)
        conv_hit = jnp.where(err < cfg.atol, 1.0, 0.0)
        newly_div = active * div_hit
        newly_conv = active * (1.0 - div_hit) * conv_hit
        resolved = newly_div + newly_conv
        return S(
            it=it_next,
            r=r,
            conv=s.conv + newly_conv,
            div=s.div + newly_div,
            iters=s.iters + resolved * (
                it_next.astype(jnp.float32) - s.iters
            ),
        )

    init = S(
        it=jnp.zeros((), jnp.int32),
        r=jnp.zeros((block_b, s_pad, n_pad), jnp.float32),
        conv=jnp.zeros((block_b, s_pad), jnp.float32),
        div=jnp.zeros((block_b, s_pad), jnp.float32),
        iters=jnp.full((block_b, s_pad), float(cfg.max_iter), jnp.float32),
    )
    out = jax.lax.while_loop(cond, body, init)
    r_ref[:] = out.r
    conv_ref[:] = out.conv.astype(jnp.int32)
    div_ref[:] = out.div.astype(jnp.int32)
    iters_ref[:] = out.iters.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_b", "check_every", "interpret"),
)
def solve_fixed_point_pallas(
    cfg: SSNConfig,
    W: jnp.ndarray,  # (B, 2N, 2N)
    I_ext: jnp.ndarray,  # (S, 2N) shared stimulus battery
    block_b: int = 8,
    check_every: int = 4,
    interpret: bool = False,
) -> FixedPointResult:
    """Fixed-point solve via the fused VMEM-resident kernel.

    Same contract as ``solve_fixed_point`` for the common generator layout
    (single leading batch dim, shared stimulus battery). Forward-only (wrap
    with ops.ift for gradients).
    """
    B, n2 = W.shape[0], W.shape[-1]
    S = I_ext.shape[0]
    n_pad = _round_up(n2, LANE)
    s_pad = _round_up(S, 8)
    b_pad = _round_up(B, block_b)

    Wp = jnp.zeros((b_pad, n_pad, n_pad), jnp.float32)
    Wp = Wp.at[:B, :n2, :n2].set(W.astype(jnp.float32))
    Ip = jnp.zeros((s_pad, n_pad), jnp.float32)
    Ip = Ip.at[:S, :n2].set(I_ext.astype(jnp.float32))
    dtau = jnp.zeros((1, n_pad), jnp.float32)
    dtau = dtau.at[0, :n2].set(
        (cfg.dt / cfg.tau_vector(dtype=jnp.float32)).astype(jnp.float32)
    )

    grid = (b_pad // block_b,)
    kernel = functools.partial(
        _solver_kernel, cfg, block_b, s_pad, n_pad, check_every
    )
    r, conv, div, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, s_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, s_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, s_pad), jnp.int32),
        ],
        interpret=interpret,
    )(Wp, Ip, dtau)

    # Padded stimulus rows converge instantly (I = 0, r = 0); padded batch
    # rows are dropped here.
    return FixedPointResult(
        r=r[:B, :S, :n2],
        converged=conv[:B, :S].astype(bool),
        diverged=div[:B, :S].astype(bool),
        iters=iters[:B, :S],
    )
