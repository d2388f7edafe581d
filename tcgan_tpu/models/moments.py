"""Moment-matching fit: non-adversarial alternative to the WGAN.

Reference parity: ``tc_gan/networks/moment_matching.py`` +
``tc_gan/run/bptt_moments.py`` (SURVEY.md §2 "Moment matching", §3.5,
[BASELINE] config C5). Loss = weighted squared distance between generated
and data tuning-curve moments (per-feature means + second moments /
covariances), optimized with Adam on the same generator parameters.

The moment weights follow the reference's scheme as recalled: each moment
error is normalized by the data moment's scale so heterogeneous features
contribute comparably:

    L = mean_m [ (m_gen - m_data)^2 / (|m_data| + eps)^2 ]

summed over mean-moments and (optionally) second-moment entries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tcgan_tpu.models import generator as gen_lib
from tcgan_tpu.models.generator import GeneratorConfig


@dataclasses.dataclass(frozen=True)
class MomentMatchingConfig:
    gen: GeneratorConfig = GeneratorConfig()
    batch_size: int = 64
    lr: float = 1e-3
    beta1: float = 0.5
    beta2: float = 0.9
    mean_weight: float = 1.0
    cov_weight: float = 1.0
    moment_eps: float = 1e-2
    rate_cost: float = 0.01
    clip_grad: float = 0.0  # global-norm gradient clip (0 = off)
    seed: int = 0
    # Common random numbers (simulated method of moments): reuse ONE fixed
    # quenched-noise draw every step instead of resampling z. The objective
    # becomes deterministic, so Adam converges to the z-set's optimum
    # instead of stalling at the minibatch-noise floor — essential when the
    # start<->truth moment signal is below the per-batch sampling noise
    # (BASELINE.md round-2b stall analysis). The residual Monte-Carlo error
    # of the z-set itself shrinks with batch_size.
    fixed_z: bool = False
    # Survivor-selection-consistent generated moments: mask non-converged
    # circuits out of the generated moments, matching the fake-truth
    # dataset's keep-only-fully-converged selection (see sample_mask).
    # Default ON — the unmasked objective actively repels the truth on
    # fragile batteries (BASELINE.md round-2b, loss(truth)=489 vs 0.004).
    # Turn OFF only to reproduce pre-round-2b unmasked baselines; this
    # changes loss values for runs with partial divergence.
    survivor_mask: bool = True
    # Moment averaging: exponential moving average of the GENERATED moments
    # across steps (decay gamma; 0 = off). The loss residual uses the EMA,
    # so generator-side Monte-Carlo error shrinks by ~(1-gamma) while fresh
    # z keeps the estimate unbiased — the effective generator sample count
    # becomes ~batch/(1-gamma). Gradients flow through the current batch's
    # (1-gamma) contribution; Adam's scale invariance absorbs the factor.
    moment_ema: float = 0.0
    # Two-phase gamma schedule (round-4c orbit-damping sweep, BASELINE.md):
    # long windows (0.995) are right for the DESCENT (D's weak ridge
    # signal needs the variance reduction) but their ~1/(1-gamma)-update
    # lag sustains a limit cycle near truth; gamma 0.98 measured a 10x
    # orbit-amplitude collapse with no starvation once near truth. With
    # moment_ema_switch_step > 0 the EMA decay switches from moment_ema
    # to moment_ema_late at that step — one run encodes
    # descend-then-damp. (The Adam-style debias factor keeps using the
    # CURRENT gamma; by any sensible switch step the EMA is warm and the
    # factor is ~1, so the approximation is immaterial.)
    moment_ema_late: float = 0.0
    moment_ema_switch_step: int = 0

    def __post_init__(self):
        # The EMA branch is gated on moment_ema > 0, so a late-phase gamma
        # without a base gamma would be SILENTLY ignored — error loudly
        # instead, like the other contradictory-flag combinations
        # (ADVICE r4 #3).
        if self.moment_ema_late > 0 and self.moment_ema <= 0:
            raise ValueError(
                "moment_ema_late > 0 requires moment_ema > 0 (the EMA "
                "branch is gated on the base gamma; --moment-ema-late "
                "with --moment-ema 0 would silently run without any EMA)")


def effective_gamma(cfg, step, base=None, late=None, switch=None):
    """EMA decay at this step under the two-phase gamma schedule (see
    MomentMatchingConfig.moment_ema_late). Returns the plain float when
    the switch is off; a traced scalar otherwise. Shared with the WGAN
    moment anchor (wgan.anchor_loss passes its own field triple)."""
    base = cfg.moment_ema if base is None else base
    late = cfg.moment_ema_late if late is None else late
    switch = cfg.moment_ema_switch_step if switch is None else switch
    if switch <= 0 or late <= 0:
        return base
    return jnp.where(step >= switch, late, base)


class MMState(NamedTuple):
    gen_params: Dict[str, jnp.ndarray]
    opt: Any
    step: jnp.ndarray
    # EMA of generated (mean, second) moments when cfg.moment_ema > 0;
    # None otherwise. ema_count tracks how many batches actually blended
    # in (zero-survivor batches hold the EMA), so the debias factor
    # matches the accumulated mass even across divergence episodes.
    ema_mean: Any = None
    ema_second: Any = None
    ema_count: Any = None
    # Per-state CRN key for cfg.fixed_z: ensemble members must each carry
    # their OWN fixed z-set (a shared PRNGKey(cfg.seed) would make the
    # z-set's Monte-Carlo error a common bias invisible to the
    # member-to-member spread the ensemble analysis measures).
    z_key: Any = None


class MMMetrics(NamedTuple):
    loss: jnp.ndarray
    mean_err: jnp.ndarray
    cov_err: jnp.ndarray
    rate_penalty: jnp.ndarray
    frac_converged: jnp.ndarray
    frac_diverged: jnp.ndarray


def data_moments(tc: jnp.ndarray,
                 weights: jnp.ndarray | None = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(mean vector, second-moment matrix) of a set of TC samples (B, D),
    optionally sample-weighted (0/1 masks)."""
    if weights is None:
        mean = jnp.mean(tc, axis=0)
        second = tc.T @ tc / tc.shape[0]
        return mean, second
    w = weights.astype(tc.dtype)
    # epsilon floor, NOT 1.0: soft survivor weights (the absorbing-state
    # fallback) can legitimately sum below 1, and a 1.0 clamp would bias
    # the weighted moments low by exactly w.sum(). The all-zero case
    # (moments -> 0) must be guarded by the caller (it is not an
    # estimate); see the EMA has_data holds here and in wgan.anchor_loss.
    n = jnp.maximum(w.sum(), 1e-6)
    mean = (tc * w[:, None]).sum(axis=0) / n
    second = (tc * w[:, None]).T @ tc / n
    return mean, second


def survivor_chain(conv: jnp.ndarray, dtype) -> jnp.ndarray:
    """Per-circuit survivor weights with an absorbing-state fallback.

    Primary: the strict all-conditions mask matching the fake-truth
    dataset's survivor selection (data/datasets.py). Fallback: when NO
    circuit in the batch fully converged — an all-zero mask would delete
    the entire gradient, freezing a deterministic (fixed_z) objective
    permanently — use the SOFT weight (fraction of converged conditions
    per circuit) so mostly-converged circuits keep pulling the generator
    back toward the convergent region; once any circuit fully converges
    again the strict semantics resume. Shared by the WGAN family
    (rejection masks, anchor) and the moment matcher."""
    convf = jax.lax.stop_gradient(conv).astype(dtype)  # (B, S)
    strict = jnp.min(convf, axis=-1)  # (B,)
    soft = jnp.mean(convf, axis=-1)  # (B,)
    return jnp.where(jnp.sum(strict) > 0.0, strict, soft)


def sample_mask(cfg: MomentMatchingConfig, out) -> jnp.ndarray:
    """Per-critic-sample 0/1 mask matching the DATASET's selection
    semantics: fake-truth generation keeps only circuits whose EVERY
    battery condition converged (data/datasets.py), so the generated
    moments must apply the same selection — otherwise ceiling-clamped
    non-converged samples poison the second moments quadratically and the
    optimizer is driven AWAY from any truth that occasionally diverges
    (observed: loss(truth) = 489 vs loss(wrong-but-stable point) = 0.004
    on the near-critical battery; BASELINE.md round-2b). Non-differentiable
    bookkeeping -> stop_gradient."""
    import jax

    ok = survivor_chain(out.converged, jnp.float32)  # (B,)
    if cfg.gen.track_offset_identity:
        return ok
    return jnp.repeat(ok, cfg.gen.n_probe)


def moment_loss(cfg: MomentMatchingConfig, gen_tc, data_mean, data_second,
                weights=None):
    gmean, gsecond = data_moments(gen_tc, weights)
    wm = 1.0 / (jnp.abs(data_mean) + cfg.moment_eps) ** 2
    wc = 1.0 / (jnp.abs(data_second) + cfg.moment_eps) ** 2
    mean_err = jnp.mean(wm * (gmean - data_mean) ** 2)
    cov_err = jnp.mean(wc * (gsecond - data_second) ** 2)
    return cfg.mean_weight * mean_err + cfg.cov_weight * cov_err, (mean_err, cov_err)


def make_optimizer(cfg: MomentMatchingConfig):
    adam = optax.adam(cfg.lr, b1=cfg.beta1, b2=cfg.beta2)
    if cfg.clip_grad > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.clip_grad), adam)
    return adam


def init_state(cfg: MomentMatchingConfig,
               gen_init: Dict[str, jnp.ndarray] | None = None,
               z_key: jax.Array | None = None) -> MMState:
    """z_key: the CRN key used when cfg.fixed_z (defaults to
    PRNGKey(cfg.seed)); ensemble init passes a distinct key per member."""
    gen_params = gen_init if gen_init is not None else gen_lib.init_params(cfg.gen)
    d = cfg.gen.tc_dim
    dtype = cfg.gen.dtype
    return MMState(
        gen_params, make_optimizer(cfg).init(gen_params),
        jnp.zeros((), jnp.int32),
        ema_mean=jnp.zeros((d,), dtype) if cfg.moment_ema > 0 else None,
        ema_second=jnp.zeros((d, d), dtype) if cfg.moment_ema > 0 else None,
        ema_count=jnp.zeros((), dtype) if cfg.moment_ema > 0 else None,
        z_key=(z_key if z_key is not None
               else jax.random.PRNGKey(cfg.seed)),
    )


def train_step_impl(
    cfg: MomentMatchingConfig,
    state: MMState,
    data_mean: jnp.ndarray,
    data_second: jnp.ndarray,
    key: jax.Array,
) -> Tuple[MMState, MMMetrics]:
    tx = make_optimizer(cfg)
    if cfg.fixed_z:
        # constant across steps (CRN), per-STATE so vmapped ensemble
        # members each optimize their own fixed z-set (the None fallback
        # keeps pre-z_key checkpoints restorable)
        k = (state.z_key if state.z_key is not None
             else jax.random.PRNGKey(cfg.seed))
    else:
        k = jax.random.fold_in(key, state.step)

    def loss_fn(gen_params):
        out = gen_lib.sample_tuning_curves(cfg.gen, gen_params, k, cfg.batch_size)
        w = sample_mask(cfg, out) if cfg.survivor_mask else None
        if cfg.moment_ema > 0:
            # Moment averaging (see config docstring): blend the batch
            # moments into the running EMA (stop-gradient on the history,
            # debiased like Adam), and penalize the EMA-vs-data residual.
            # Zero-survivor guard: a batch with no survivors yields
            # all-zero "moments" — not an estimate — so the EMA holds and
            # the update counter does not advance (debias then matches
            # the mass actually accumulated, even across divergence
            # episodes).
            g = effective_gamma(cfg, state.step)
            sg = jax.lax.stop_gradient
            bmean, bsecond = data_moments(out.tc, w)
            has_data = (jnp.sum(w) > 0 if w is not None
                        else jnp.asarray(True))
            new_em = jnp.where(has_data,
                               g * sg(state.ema_mean) + (1 - g) * bmean,
                               sg(state.ema_mean))
            new_es = jnp.where(has_data,
                               g * sg(state.ema_second) + (1 - g) * bsecond,
                               sg(state.ema_second))
            new_count = state.ema_count + has_data.astype(bmean.dtype)
            debias = jnp.maximum(1.0 - g ** new_count, 1e-12)
            wm = 1.0 / (jnp.abs(data_mean) + cfg.moment_eps) ** 2
            wc = 1.0 / (jnp.abs(data_second) + cfg.moment_eps) ** 2
            me = jnp.mean(wm * (new_em / debias - data_mean) ** 2)
            ce = jnp.mean(wc * (new_es / debias - data_second) ** 2)
            mloss = cfg.mean_weight * me + cfg.cov_weight * ce
            ema_out = (new_em, new_es, new_count)
        else:
            mloss, (me, ce) = moment_loss(cfg, out.tc, data_mean,
                                          data_second, weights=w)
            ema_out = (None, None, None)
        pen = gen_lib.rate_penalty(cfg.gen, out.rates)
        stats = (
            me, ce, pen,
            jnp.mean(out.converged.astype(jnp.float32)),
            jnp.mean(out.diverged.astype(jnp.float32)),
            ema_out,
        )
        return mloss + cfg.rate_cost * pen, stats

    (loss, (me, ce, pen, fconv, fdiv, ema_out)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.gen_params)
    updates, opt = tx.update(grads, state.opt, state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, updates)
    return (
        MMState(gen_params, opt, state.step + 1,
                ema_mean=(jax.lax.stop_gradient(ema_out[0])
                          if cfg.moment_ema > 0 else None),
                ema_second=(jax.lax.stop_gradient(ema_out[1])
                            if cfg.moment_ema > 0 else None),
                ema_count=(jax.lax.stop_gradient(ema_out[2])
                           if cfg.moment_ema > 0 else None),
                z_key=state.z_key),
        MMMetrics(loss, me, ce, pen, fconv, fdiv),
    )


train_step = jax.jit(train_step_impl, static_argnames=("cfg",))
