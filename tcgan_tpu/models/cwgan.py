"""Conditional WGAN: critic conditioned on the stimulus condition.

Reference parity: ``tc_gan/networks/cwgan.py`` (SURVEY.md §2 "Conditional
WGAN", [BASELINE] config C4). One fit spans the whole contrast x bandwidth
grid by tagging every tuning-curve sample with its stimulus condition and
conditioning the critic on that tag:

- each sampled circuit yields one critic sample PER stimulus condition:
  the probe readout for that condition concatenated with the condition's
  (bandwidth, contrast) feature vector;
- real data samples are tagged the same way, and real/fake pairing for the
  gradient-penalty interpolates happens within the same condition (the
  stacked layout preserves condition order on both sides, so interpolation
  never mixes conditions' tags).

The training schedule, losses, and optimizers are shared with
:mod:`tcgan_tpu.models.wgan`.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from tcgan_tpu.models import critic as critic_lib
from tcgan_tpu.models import generator as gen_lib
from tcgan_tpu.models.critic import CriticConfig
from tcgan_tpu.models.wgan import StepMetrics, TrainState, WGANConfig


@dataclasses.dataclass(frozen=True)
class CWGANConfig(WGANConfig):
    """WGANConfig whose critic sees (per-condition TC block, condition)."""

    # Per-(condition, probe) critic input scale, flattened (S*P,) plus 2
    # trailing scales for the (bandwidth, contrast) tag features — the
    # per-condition normalization lever (BASELINE.md rec13 stall: a single
    # global per-feature scale lets heavy-tailed near-critical conditions
    # swamp the critic's per-batch signal). Applied at tagging time so the
    # real and fake sides are normalized identically and the GP
    # interpolates live in the normalized space. None = use the plain
    # ``input_scale`` (condition-averaged) path.
    cond_input_scale: Tuple[float, ...] | None = None
    # Per-condition loss weights (S,), mean-1: upweights named conditions
    # (e.g. the informative near-critical contrast) in the critic's
    # Wasserstein objective and in the generator loss. None = uniform.
    cond_weight: Tuple[float, ...] | None = None

    @property
    def cond_dim(self) -> int:
        return 2  # (bandwidth, contrast)

    @property
    def critic_cfg(self) -> CriticConfig:
        return CriticConfig(
            in_dim=self.gen.n_probe + self.cond_dim,
            layers=self.critic_layers,
            dtype=self.gen.dtype,
            input_scale=None if self.cond_input_scale is not None
            else self.input_scale,
        )

    @property
    def critic_batch(self) -> int:
        return self.batch_size * self.gen.n_stim


def tag_with_conditions(cfg: CWGANConfig, tc_by_cond: jnp.ndarray) -> jnp.ndarray:
    """(B, S, P) per-condition probe blocks -> (B*S, P + 2) tagged samples.

    Condition features are appended in battery order; layout is
    condition-major within each circuit so real/fake stacks align. When
    ``cfg.cond_input_scale`` is set, probe blocks are scaled per
    (condition, probe) and tag features per feature before concatenation.
    """
    B, S, P = tc_by_cond.shape
    feats = cfg.gen.condition_features().astype(tc_by_cond.dtype)  # (S, 2)
    if cfg.cond_input_scale is not None:
        scale = jnp.asarray(cfg.cond_input_scale, dtype=tc_by_cond.dtype)
        tc_by_cond = tc_by_cond * scale[: S * P].reshape(S, P)
        feats = feats * scale[S * P:]
    feats = jnp.broadcast_to(feats[None], (B, S, feats.shape[-1]))
    return jnp.concatenate([tc_by_cond, feats], axis=-1).reshape(B * S, -1)


def cond_row_weights(cfg: CWGANConfig, n_rows: int,
                     dtype=None) -> jnp.ndarray | None:
    """Broadcast ``cfg.cond_weight`` (S,) to per-row weights (n_rows,) for
    the condition-major (circuit, condition) row layout. None when off."""
    if cfg.cond_weight is None:
        return None
    w = jnp.asarray(cfg.cond_weight, dtype=dtype or cfg.gen.dtype)
    return jnp.tile(w, n_rows // w.shape[0])


def _combine_w(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a * b


def sample_conditional(cfg: CWGANConfig, gen_params, key, batch):
    """Generator forward returning condition-tagged critic samples."""
    out = gen_lib.sample_tuning_curves(
        dataclasses.replace(cfg.gen, track_offset_identity=True),
        gen_params, key, batch,
    )
    # recover (B, S, P) from the flattened (B, S*P) readout
    tc_by_cond = out.tc.reshape(batch, cfg.gen.n_stim, cfg.gen.n_probe)
    return tag_with_conditions(cfg, tc_by_cond), out


def fake_row_weights(cfg: CWGANConfig, out) -> jnp.ndarray | None:
    """Per-tagged-row weights matching the fake-truth dataset's survivor
    selection: the dataset keeps only circuits whose EVERY battery
    condition converged, so the mask is per CIRCUIT (all-conditions),
    broadcast over that circuit's condition rows. (A per-solve mask would
    let converged rows of partially-diverged circuits into the fake
    conditional distribution while the real data excludes those circuits
    entirely — the selection mismatch the flag exists to remove.)"""
    if not cfg.reject_unconverged:
        return None
    conv = jax.lax.stop_gradient(out.converged)  # (B, S) bool
    convf = conv.astype(cfg.gen.dtype)
    ok = jnp.min(convf, axis=-1, keepdims=True)  # (B, 1)
    strict = jnp.broadcast_to(ok, conv.shape)
    # Absorbing-state fallback (see wgan._survivor_chain): when NO circuit
    # fully converged, fall back to the per-solve row mask — converged rows
    # of partially-diverged circuits re-enter the loss so the generator
    # keeps a gradient pulling it back toward the convergent region;
    # strict per-circuit semantics resume as soon as any circuit survives.
    return jnp.where(jnp.sum(ok) > 0.0, strict, convf).reshape(-1)


def critic_loss_fn(cfg: CWGANConfig, critic_params, real, fake, key,
                   fake_w=None):
    from tcgan_tpu.models.wgan import _wmean, gradient_penalty

    d_real = critic_lib.apply(cfg.critic_cfg, critic_params, real)
    d_fake = critic_lib.apply(cfg.critic_cfg, critic_params, fake)
    # Same GP guard as wgan.critic_loss_fn: keep interpolates away from
    # rejected (clamped) fake rows.
    fake_gp = fake
    if fake_w is not None:
        fake_gp = jnp.where(fake_w[:, None] > 0.5, fake,
                            real[: fake.shape[0]])
    gp = gradient_penalty(cfg, critic_params, real, fake_gp, key)
    real_cw = cond_row_weights(cfg, d_real.shape[0], dtype=real.dtype)
    fake_cw = cond_row_weights(cfg, d_fake.shape[0], dtype=real.dtype)
    wasserstein = (_wmean(d_real, real_cw)
                   - _wmean(d_fake, _combine_w(fake_w, fake_cw)))
    loss = -wasserstein + cfg.gp_lambda * gp
    # Rank accuracy with the same semantics as wgan.critic_loss_fn (fraction
    # of comparable (real, fake) pairs ranked correctly) — here "comparable"
    # means same stimulus condition, so pair within conditions only. Layout
    # is condition-major within each circuit: row index = b * n_stim + s.
    # Rejected fake rows are excluded (weighted), as in wgan.
    S = cfg.gen.n_stim
    dr = d_real.reshape(-1, S)  # (B_real, S)
    df = d_fake.reshape(-1, S)  # (B_fake, S)
    pairs = (dr[:, None, :] > df[None, :, :]).astype(real.dtype)
    if fake_w is None:
        acc = jnp.mean(pairs)
    else:
        wf = fake_w.reshape(-1, S)  # (B_fake, S)
        acc = jnp.sum(pairs * wf[None, :, :]) / jnp.maximum(
            dr.shape[0] * jnp.sum(wf), 1.0)
    return loss, (wasserstein, gp, acc)


def gen_loss_fn(cfg: CWGANConfig, gen_params, critic_params, key):
    """Generator loss (same signature as wgan.gen_loss_fn): negative critic
    score of condition-tagged samples + rate penalty."""
    from tcgan_tpu.models.wgan import _wmean

    fake, out = sample_conditional(cfg, gen_params, key, cfg.batch_size)
    d_fake = critic_lib.apply(cfg.critic_cfg, critic_params, fake)
    pen = gen_lib.rate_penalty(cfg.gen, out.rates)
    stats = (
        pen,
        jnp.mean(out.converged.astype(jnp.float32)),
        jnp.mean(out.diverged.astype(jnp.float32)),
        jnp.mean(out.iters.astype(jnp.float32)),
        jnp.mean(jnp.min(out.converged.astype(jnp.float32), axis=-1)),
    )
    w = _combine_w(fake_row_weights(cfg, out),
                   cond_row_weights(cfg, d_fake.shape[0], dtype=fake.dtype))
    return (-_wmean(d_fake, w) + cfg.rate_cost * pen, stats)


# Same state contract and init as the unconditional WGAN: the body only
# touches cfg through the polymorphic critic_cfg/gen properties, so share
# the implementation outright instead of hand-mirroring it (the mirror
# already had to be patched in lockstep once, for the anchor buffers).
from tcgan_tpu.models.wgan import init_state  # noqa: E402,F401


def train_step_impl(
    cfg: CWGANConfig,
    n_critic: int,
    state: TrainState,
    real_stack: jnp.ndarray,  # (n_critic, B*S, P + 2) condition-tagged
    key: jax.Array,
) -> Tuple[TrainState, StepMetrics]:
    from tcgan_tpu.models.wgan import make_optimizers

    gen_tx, critic_tx = make_optimizers(cfg)
    key_c, key_g = jax.random.split(jax.random.fold_in(key, state.step))

    def critic_update(carry, inp):
        critic_params, critic_opt = carry
        real, k = inp
        k_z, k_gp = jax.random.split(k)
        fake, fout = sample_conditional(cfg, state.gen_params, k_z,
                                        cfg.batch_size)
        fake = jax.lax.stop_gradient(fake)
        fake_w = fake_row_weights(cfg, fout)
        (loss, (w, gp, acc)), grads = jax.value_and_grad(
            lambda cp: critic_loss_fn(cfg, cp, real, fake, k_gp,
                                      fake_w=fake_w), has_aux=True
        )(critic_params)
        updates, critic_opt = critic_tx.update(grads, critic_opt, critic_params)
        critic_params = optax.apply_updates(critic_params, updates)
        return (critic_params, critic_opt), (loss, w, gp, acc)

    keys_c = jax.random.split(key_c, n_critic)
    (critic_params, critic_opt), (d_losses, ws, gps, accs) = jax.lax.scan(
        critic_update, (state.critic_params, state.critic_opt),
        (real_stack, keys_c),
    )

    from tcgan_tpu.models.wgan import (apply_anchor_update,
                                       next_drift_latch, next_endgame,
                                       scale_updates_for_endgame)

    (g_loss, (pen, fconv, fdiv, miters, cyield)), g_grads = jax.value_and_grad(
        lambda gp_: gen_loss_fn(cfg, gp_, critic_params, key_g), has_aux=True
    )(state.gen_params)
    g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
    g_updates = scale_updates_for_endgame(cfg, state, g_updates)
    gen_params = optax.apply_updates(state.gen_params, g_updates)

    # The anchor operates on the JOINT per-circuit TC vector — exactly the
    # cross-condition structure the conditional row decomposition cannot
    # see (BASELINE.md round-3 scale probe, conclusion 2). The joint
    # layout cfg matches the dataset representation gan_common computes
    # the data moments from (track_offset_identity=True).
    gen_params, anchor_state, a_res = apply_anchor_update(
        cfg, state, gen_params, key_g,
        gen_cfg=dataclasses.replace(cfg.gen, track_offset_identity=True))
    drift_fields, drift_ratio = next_drift_latch(cfg, state, gen_params)

    ema_params = state.ema_params
    if cfg.ema_decay > 0 and ema_params is not None:
        d = cfg.ema_decay
        ema_params = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                  ema_params, gen_params)

    new_state = TrainState(
        gen_params=gen_params, gen_opt=gen_opt,
        critic_params=critic_params, critic_opt=critic_opt,
        step=state.step + 1, ema_params=ema_params,
        data_mean=state.data_mean, data_second=state.data_second,
        endgame=next_endgame(cfg, state, a_res),
        **drift_fields,
        **anchor_state,
    )
    metrics = StepMetrics(
        d_loss=d_losses[-1], g_loss=g_loss, wasserstein=ws[-1], gp=gps[-1],
        rate_penalty=pen, frac_converged=fconv, frac_diverged=fdiv,
        mean_iters=miters, d_accuracy=accs[-1],
        d_loss_iters=d_losses, wasserstein_iters=ws, gp_iters=gps,
        acc_iters=accs,
        anchor_residual=a_res,
        circuit_yield=cyield,
        drift_ratio=drift_ratio,
    )
    return new_state, metrics


train_step = jax.jit(train_step_impl, static_argnames=("cfg", "n_critic"))
