"""Unrolled Euler integration (`lax.scan`) — the BPTT-differentiable path.

Reference parity: the ``theano.scan`` Euler unroll in
``tc_gan/networks/ssn.py`` (SURVEY.md §2 "Euler SSN model (BPTT)",
[BASELINE] config C3). Differences by design:

- `lax.scan` instead of `theano.scan`; reverse-mode autodiff through the
  scan gives BPTT gradients.
- optional gradient checkpointing (`jax.checkpoint` over chunks of steps) so
  BPTT memory is O(seqlen / chunk + chunk) instead of O(seqlen) — the
  reference just paid the O(seqlen) memory.
- divergence is not an abort here: the final state carries the same
  converged/diverged flags as the fixed-point solver so the loss layer can
  penalize, while gradients remain well-defined (flags are computed outside
  the differentiable path via stop_gradient).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tcgan_tpu.ops.fixed_point import FixedPointResult
from tcgan_tpu.ops.ssn import SSNConfig, recurrent_drive


def solve_dynamics(
    cfg: SSNConfig,
    W: jnp.ndarray,
    I_ext: jnp.ndarray,
    r0: jnp.ndarray | None = None,
    seqlen: int | None = None,
    checkpoint_chunk: int | None = None,
    return_trajectory: bool = False,
    clip_factor: float = 10.0,
):
    """Integrate the SSN for a fixed number of Euler steps (differentiable).

    Args:
      cfg: static configuration.
      W: (..., 2N, 2N); I_ext: (..., S, 2N); r0 defaults to zeros.
      seqlen: number of steps (default ``cfg.seqlen``).
      checkpoint_chunk: if set, wrap each chunk of this many steps in
        `jax.checkpoint` (remat) to cut BPTT memory; must divide seqlen.
      return_trajectory: if True also return the full (seqlen, ..., S, 2N)
        trajectory (memory-heavy; for tests/analysis).
      clip_factor: rates are hard-clipped at ``clip_factor * rate_stop_at``
        inside the scan so divergent samples saturate instead of overflowing
        to inf/NaN — their gradient contribution dies at the clip (the
        min()'s zero derivative) rather than poisoning the batch; they are
        still flagged ``diverged`` since the clip sits above the detection
        ceiling.

    Returns:
      FixedPointResult (with flags computed from the final step residual), or
      (FixedPointResult, trajectory) when ``return_trajectory``.
    """
    seqlen = cfg.seqlen if seqlen is None else seqlen
    f = cfg.io_fun()
    dtype = W.dtype
    lead = jnp.broadcast_shapes(W.shape[:-2], I_ext.shape[:-2])
    S = I_ext.shape[-2]
    n2 = W.shape[-1]
    if r0 is None:
        r0 = jnp.zeros(lead + (S, n2), dtype=dtype)
    else:
        r0 = jnp.broadcast_to(r0, lead + (S, n2)).astype(dtype)
    I_ext = I_ext.astype(dtype)
    dt_over_tau = cfg.step_gain(dtype=dtype)

    r_ceiling = clip_factor * cfg.rate_stop_at

    # Divergence is flagged on FIRST exceedance of rate_stop_at (carried
    # through the scan), matching the fixed-point and C solvers — a
    # final-state-only check would report a transiently-exceeding sample
    # as converged even though its trajectory was distorted by the
    # r_ceiling clip, making sample acceptance solver-dependent exactly
    # for the near-critical samples the rejection machinery exists for.
    div0 = jnp.zeros(lead + (S,), dtype=bool)

    def step(carry, _):
        r, div = carry
        u = recurrent_drive(W, r, I_ext)
        r_next = r + dt_over_tau * (-r + f(u))
        div = div | (jnp.max(lax.stop_gradient(r_next), axis=-1)
                     > cfg.rate_stop_at)
        r_next = jnp.minimum(r_next, r_ceiling)
        return (r_next, div), (r_next if return_trajectory else None)

    if checkpoint_chunk and not return_trajectory:
        if seqlen % checkpoint_chunk:
            raise ValueError("checkpoint_chunk must divide seqlen")

        @jax.checkpoint
        def chunk(carry, _):
            carry, _ = lax.scan(step, carry, None, length=checkpoint_chunk)
            return carry, None

        (r_T, diverged), _ = lax.scan(chunk, (r0, div0), None,
                                      length=seqlen // checkpoint_chunk)
        traj = None
    else:
        (r_T, diverged), traj = lax.scan(step, (r0, div0), None,
                                         length=seqlen)

    # Convergence diagnostics on the final state (outside the gradient
    # path).
    rT = lax.stop_gradient(r_T)
    u = recurrent_drive(lax.stop_gradient(W), rT, lax.stop_gradient(I_ext))
    delta = -rT + f(u)
    err = jnp.max(jnp.abs(delta), axis=-1)
    converged = ~diverged & (err < cfg.atol)
    iters = jnp.full(lead + (S,), seqlen, dtype=jnp.int32)
    res = FixedPointResult(r_T, converged, diverged, iters)
    if return_trajectory:
        return res, traj
    return res
