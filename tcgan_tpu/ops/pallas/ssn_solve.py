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
                   check_every: int, two_phase: bool, refine: bool,
                   accel: bool,
                   W_ref, I_ref, dtau_ref, r_ref, conv_ref, div_ref,
                   iters_ref):
    """Fully 2-D kernel: the tile's state is R = block_b*s_pad rows of
    n_pad lanes. Masks live as (R, 1) float32 columns — the row-broadcast
    layout Mosaic supports natively (rank-3 singleton broadcasts and i1
    reshapes are not lowerable).

    two_phase: run a first while_loop with the MXU's fast default-precision
    (bf16-pass) matmuls down to a coarse residual, then a second loop with
    Precision.HIGHEST to the real atol. The exponential residual decay
    spends most iterations above the coarse threshold, so most of the work
    runs at fast-pass speed while the converged answer keeps f32 accuracy.

    refine: replace the phase-2 HIGHEST loop (6 bf16 MXU passes per f32
    matmul — the wall-time bottleneck, since phase 2 runs hundreds of
    iterations) with ITERATIVE REFINEMENT: once per check chunk take a
    HIGHEST-precision anchor ``u_ref = W r_ref + I`` at the current rates,
    then iterate on the correction ``e = r - r_ref`` with single-pass
    DEFAULT matmuls — ``u = u_ref + W e`` is f32-accurate in absolute terms
    because the bf16 rounding error of ``W e`` is relative to the small
    ``|e|``, not to ``|r|``. Same Euler update, same residual criterion,
    same fixed point; ~6x cheaper matmuls on the tail (measured on v5e:
    146.7k -> see BASELINE.md round-2 row).
    """
    f = _io_fns(cfg)
    R = block_b * s_pad
    I_tile = jnp.concatenate([I_ref[:]] * block_b, axis=0)  # (R, n_pad)
    dtau = dtau_ref[:]  # (1, n_pad), row-broadcasts

    def raw_drive(r, precision):
        # u rows for circuit b: r[b*s_pad:(b+1)*s_pad] @ W[b]^T  (MXU)
        outs = [
            jax.lax.dot_general(
                r[b * s_pad:(b + 1) * s_pad], W_ref[b],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            for b in range(block_b)
        ]
        return jnp.concatenate(outs, axis=0)

    def make_drive(precision):
        def drive(r):
            return raw_drive(r, precision) + I_tile

        return drive

    # Clip above the divergence ceiling: the power-law io grows runaway
    # rates super-exponentially, so an unchecked check_every window can
    # carry a sample to f32 inf (which then NaN-poisons the GAN losses).
    # Same semantics-preserving clamp as the XLA/BPTT paths.
    r_ceiling = jnp.float32(10.0 * cfg.rate_stop_at)

    def make_substep(drive):
        def substep(r, active):
            u = drive(r)
            delta = -r + f(u)
            return jnp.minimum(r + active * (dtau * delta), r_ceiling), delta

        return substep

    substep = make_substep(make_drive(jax.lax.Precision.HIGHEST))
    substep_fast = make_substep(make_drive(jax.lax.Precision.DEFAULT))

    class S(NamedTuple):
        it: jnp.ndarray
        r: jnp.ndarray  # (R, n_pad)
        conv: jnp.ndarray  # (R, 1) f32 0/1
        div: jnp.ndarray  # (R, 1) f32 0/1
        iters: jnp.ndarray  # (R, 1) f32
        # Anderson(1) chunk history; zeros-shaped (and dropped by DCE)
        # when accel is off, so both paths share one state layout.
        nhist: jnp.ndarray  # scalar f32: chunks since this loop started
        r_in_prev: jnp.ndarray  # (R, n_pad) previous chunk input
        f_prev: jnp.ndarray  # (R, n_pad) previous chunk displacement

    def apply_anderson(s: S, r_new, active, resolved):
        """Anderson(1) on the chunk map H = step^check_every — same math
        and safeguards as the XLA path (ops/fixed_point.py): extrapolate
        along the displacement secant, gate on history/bounded-gamma/
        active, clamp to [0, r_ceiling]. Residual flags keep using the
        PLAIN chunk, so the accepted fixed point and its criterion are
        unchanged."""
        f_cur = r_new - s.r
        dF = f_cur - s.f_prev
        # Row-wise lane sums via a ones-matvec: Mosaic rejects the direct
        # keepdims sum here ("invalid relayout ... replicated in
        # destination"), while the MXU contraction lowers cleanly.
        ones_col = jnp.ones((n_pad, 8), jnp.float32)

        def row_sum(x):  # (R, n_pad) -> (R, 1)
            s8 = jax.lax.dot_general(
                x, ones_col, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return s8[:, :1]

        denom = row_sum(dF * dF)  # (R, 1)
        gamma = row_sum(f_cur * dF) / (denom + 1e-30)
        h_prev = s.r_in_prev + s.f_prev
        r_aa = jnp.clip(r_new - gamma * (r_new - h_prev), 0.0, r_ceiling)
        # As in the XLA path: skip extrapolations that overshoot past the
        # divergence ceiling so the next chunk's peak test keeps its
        # plain-iteration semantics (no false divergence flags near
        # criticality).
        peak_aa = jnp.max(r_aa, axis=-1, keepdims=True)
        ok = (jnp.where(s.nhist > 0.5, 1.0, 0.0)
              * jnp.where(jnp.abs(gamma) < 2.0, 1.0, 0.0)
              * jnp.where(denom > 0.0, 1.0, 0.0)
              * jnp.where(peak_aa <= cfg.rate_stop_at, 1.0, 0.0)
              * active * (1.0 - resolved))
        return r_new + ok * (r_aa - r_new), s.r, f_cur

    def make_cond(max_it):
        def cond(s: S):
            n_resolved = jnp.sum(s.conv) + jnp.sum(s.div)
            return (s.it < max_it) & (n_resolved < R - 0.5)

        return cond

    def chunk_epilogue(s: S, r, delta, active, atol, max_it) -> S:
        """Shared end-of-chunk bookkeeping for BOTH loop variants:
        residual/peak reduction, convergence/divergence flag updates,
        iteration accounting, and the Anderson hook. One implementation
        so the resolved/iters/flag semantics cannot drift between the
        plain and iterative-refinement loops."""
        err = jnp.max(jnp.abs(delta), axis=-1, keepdims=True)  # (R, 1)
        peak = jnp.max(r, axis=-1, keepdims=True)
        it_next = s.it + check_every
        div_hit = jnp.where(peak > cfg.rate_stop_at, 1.0, 0.0)
        conv_hit = jnp.where(err < atol, 1.0, 0.0)
        newly_div = active * div_hit
        newly_conv = active * (1.0 - div_hit) * conv_hit
        resolved = newly_div + newly_conv
        r_in_prev, f_prev = s.r_in_prev, s.f_prev
        if accel:
            r, r_in_prev, f_prev = apply_anderson(s, r, active, resolved)
        return S(
            it=it_next,
            r=r,
            conv=s.conv + newly_conv,
            div=s.div + newly_div,
            # clamp: the final chunk may overshoot max_it by up to
            # check_every-1 substeps; recorded iters must never
            # exceed the budget (iters == max_iter means unresolved)
            iters=s.iters + resolved * (
                jnp.minimum(it_next, max_it).astype(jnp.float32)
                - s.iters
            ),
            nhist=s.nhist + 1.0,
            r_in_prev=r_in_prev,
            f_prev=f_prev,
        )

    def make_loop(step_fn, atol, max_it):
        def body(s: S):
            active = 1.0 - s.conv - s.div  # (R, 1)
            r = s.r
            for _ in range(check_every - 1):
                r, _ = step_fn(r, active)
            r, delta = step_fn(r, active)
            return chunk_epilogue(s, r, delta, active, atol, max_it)

        return make_cond(max_it), body

    def make_refine_loop(atol, max_it):
        """Phase-2 loop via iterative refinement (see docstring)."""
        drive_hi = make_drive(jax.lax.Precision.HIGHEST)

        cond = make_cond(max_it)

        def body(s: S):
            active = 1.0 - s.conv - s.div  # (R, 1)
            u_anchor = drive_hi(s.r)  # HIGHEST anchor, once per chunk
            r_base = s.r
            e = jnp.zeros_like(s.r)
            delta = e
            for _ in range(check_every):
                u = u_anchor + raw_drive(e, jax.lax.Precision.DEFAULT)
                delta = -(r_base + e) + f(u)
                # same overflow clamp as the plain loops (on r = r_base + e)
                e = jnp.minimum(e + active * (dtau * delta),
                                r_ceiling - r_base)
            r = r_base + e
            return chunk_epilogue(s, r, delta, active, atol, max_it)

        return cond, body

    # Derive the zero history from a live tiled value (I_tile) rather than
    # a constant: Mosaic gives constant splats a replicated layout, which
    # conflicts with the tiled layout the loop body yields for the same
    # carried slot ("invalid relayout ... replicated in destination").
    zeros_rn = I_tile * 0.0
    init = S(
        it=jnp.zeros((), jnp.int32),
        r=(f(I_tile) if cfg.init == "feedforward"
           else zeros_rn),
        conv=jnp.zeros((R, 1), jnp.float32),
        div=jnp.zeros((R, 1), jnp.float32),
        iters=jnp.full((R, 1), float(cfg.max_iter), jnp.float32),
        nhist=jnp.zeros((), jnp.float32),
        r_in_prev=zeros_rn,
        f_prev=zeros_rn,
    )
    if two_phase:
        # Phase 1: fast-pass matmuls down to a coarse residual, HARD-CAPPED
        # at half the iteration budget — the bf16-pass residual floor can
        # sit above any fixed coarse threshold for strongly-coupled
        # circuits, and without the cap phase 1 would eat the whole budget
        # and nothing would ever meet the real atol. Divergence detection
        # stays live; "converged" here only means "left phase 1".
        coarse = max(cfg.atol * 100.0, 1e-2)
        cond1, body1 = make_loop(substep_fast, coarse, cfg.max_iter // 2)
        mid = jax.lax.while_loop(cond1, body1, init)
        # Phase 2: HIGHEST-precision tail from the phase-1 state; reopen
        # the coarse-converged rows AND the diverged ones. A phase-1
        # divergence flag is a fast-pass (bf16-pass) measurement: near the
        # ceiling its ~0.4% matmul noise is amplified ~n-fold through
        # f(u)=k*u^n, so a true-peak ~199 Hz sample can falsely read
        # >rate_stop_at — and a permanent flag would systematically
        # reject valid near-critical circuits (the regime this project
        # trains in) where the HIGHEST-precision XLA reference converges
        # them. Reopened truly-divergent rows re-flag themselves within a
        # chunk or two (their r is at/above the ceiling, the dynamics
        # re-diverge immediately); falsely-flagged rows relax back and
        # converge. Flag parity with the XLA path is decided only by
        # full-precision arithmetic.
        # pallas_reopen_margin > 0: rows PINNED above margin*rate_stop_at
        # are hard divergers (bf16 noise is a few %, never 2x) — keep
        # their flag and phase-1 iteration count so they don't burn the
        # full-precision budget re-proving it (BASELINE.md round-5
        # wgan_step root cause). Only the ambiguous near-threshold band
        # gets the full-precision retrial.
        if cfg.pallas_reopen_margin > 0:
            peak1 = jnp.max(mid.r, axis=-1, keepdims=True)
            keep_div = mid.div * jnp.where(
                peak1 > cfg.pallas_reopen_margin * cfg.rate_stop_at,
                1.0, 0.0)
        else:
            keep_div = jnp.zeros_like(mid.div)
        init2 = S(it=mid.it, r=mid.r,
                  conv=jnp.zeros_like(mid.conv),
                  div=keep_div,
                  iters=keep_div * mid.iters
                  + (1.0 - keep_div) * float(cfg.max_iter),
                  # Anderson history does NOT carry across the phase
                  # boundary: phase 2's chunk map differs (precision /
                  # refine form), so the phase-1 secant would mislead the
                  # first extrapolation. nhist=0 re-arms the gate.
                  nhist=jnp.zeros((), jnp.float32),
                  r_in_prev=zeros_rn,
                  f_prev=zeros_rn)
        if refine:
            cond2, body2 = make_refine_loop(cfg.atol, cfg.max_iter)
        else:
            cond2, body2 = make_loop(substep, cfg.atol, cfg.max_iter)
        out = jax.lax.while_loop(cond2, body2, init2)
    else:
        cond1, body1 = make_loop(substep, cfg.atol, cfg.max_iter)
        out = jax.lax.while_loop(cond1, body1, init)
    for b in range(block_b):
        r_ref[b] = out.r[b * s_pad:(b + 1) * s_pad]
    conv_ref[:] = out.conv.astype(jnp.int32)
    div_ref[:] = out.div.astype(jnp.int32)
    iters_ref[:] = out.iters.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "block_b", "check_every", "interpret",
                     "two_phase", "refine", "accel"),
)
def solve_fixed_point_pallas(
    cfg: SSNConfig,
    W: jnp.ndarray,  # (B, 2N, 2N)
    I_ext: jnp.ndarray,  # (S, 2N) shared stimulus battery
    block_b: int = 16,
    check_every: int = 4,
    interpret: bool = False,
    two_phase: bool = True,
    refine: bool = True,
    accel: bool = False,
) -> FixedPointResult:
    """Fixed-point solve via the fused VMEM-resident kernel.

    Same contract as ``solve_fixed_point`` for the common generator layout
    (single leading batch dim, shared stimulus battery). Forward-only (wrap
    with ops.ift for gradients).

    State layout is circuit-stim rows x neuron lanes ("rows"). A transposed
    variant with nominally better MXU shapes (M = n_pad instead of s_pad)
    was built and measured ~3x SLOWER on v5e — lane-dimension slicing
    forces Mosaic relayouts — and was removed in round 3 (it also never
    supported the two_phase/refine/accel precision strategy; a
    half-supported variant is a benchmarking foot-gun). two_phase:
    fast-pass first loop + HIGHEST-precision tail.
    """
    B, n2 = W.shape[0], W.shape[-1]
    S = I_ext.shape[0]
    n_pad = _round_up(n2, LANE)
    s_pad = _round_up(S, 8)
    # VMEM guard: the W tile is double-buffered by the Pallas pipeline and
    # the kernel stack grows with n_pad (unrolled substep buffers), all
    # within the 16 MB scoped VMEM limit. Budgets verified on v5e:
    # n_pad=128 runs with a 4 MB tile (block_b=16); n_pad=512 OOMs beyond a
    # 2 MB tile (block_b=2 works, 4 does not).
    vmem_budget = (2 if n_pad > 256 else 5) * 1024 * 1024
    max_bb = max(1, vmem_budget // (n_pad * n_pad * 4))
    block_b = min(block_b, max_bb)
    b_pad = _round_up(B, block_b)
    n_tiles = b_pad // block_b

    Wp = jnp.zeros((b_pad, n_pad, n_pad), jnp.float32)
    Wp = Wp.at[:B, :n2, :n2].set(W.astype(jnp.float32))
    Ip = jnp.zeros((s_pad, n_pad), jnp.float32)
    Ip = Ip.at[:S, :n2].set(I_ext.astype(jnp.float32))
    dt_tau = jnp.zeros((n_pad,), jnp.float32)
    dt_tau = dt_tau.at[:n2].set(
        cfg.step_gain(dtype=jnp.float32).astype(jnp.float32)
    )

    grid = (n_tiles,)
    kernel = functools.partial(
        _solver_kernel, cfg, block_b, s_pad, n_pad, check_every,
        two_phase, refine, accel,
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
            pl.BlockSpec((block_b * s_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b * s_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b * s_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, s_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b_pad * s_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad * s_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((b_pad * s_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(Wp, Ip, dt_tau[None, :])
    conv = conv.reshape(b_pad, s_pad)
    div = div.reshape(b_pad, s_pad)
    iters = iters.reshape(b_pad, s_pad)

    # Padded stimulus rows converge instantly (I = 0, r = 0); padded batch
    # rows are dropped here.
    return FixedPointResult(
        r=r[:B, :S, :n2],
        converged=conv[:B, :S].astype(bool),
        diverged=div[:B, :S].astype(bool),
        iters=iters[:B, :S],
    )
