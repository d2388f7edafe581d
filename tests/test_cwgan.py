"""Conditional-WGAN unit tests: condition tagging/scaling, per-condition
row weights, per-circuit survivor rejection, and condition-weighted
critic loss (folded from the round-numbered grab-bag per VERDICT r3 #7)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tcgan_tpu.models import cwgan as cwgan_lib
from tcgan_tpu.models.cwgan import CWGANConfig
from tests.test_wgan import small_gen_cfg


def test_cond_input_scale_applied_at_tagging():
    gen = small_gen_cfg()
    S, P = gen.n_stim, gen.n_probe
    scale = np.arange(1, S * P + 3, dtype=np.float32)  # S*P + 2 tag scales
    cfg = CWGANConfig(gen=gen, cond_input_scale=tuple(float(x) for x in scale))
    B = 3
    tc = jnp.ones((B, S, P), jnp.float32)
    tagged = cwgan_lib.tag_with_conditions(cfg, tc)
    assert tagged.shape == (B * S, P + 2)
    # probe block of (circuit 0, condition s) must equal scale[s*P:(s+1)*P]
    got = np.asarray(tagged)[:S, :P]
    want = scale[: S * P].reshape(S, P)
    np.testing.assert_allclose(got, want)
    # tag features scaled by the trailing two entries
    feats = np.asarray(gen.condition_features())
    np.testing.assert_allclose(np.asarray(tagged)[:S, P:],
                               feats * scale[S * P:], rtol=1e-6)
    # the critic's own static input_scale must be disabled (no double scale)
    assert cfg.critic_cfg.input_scale is None


def test_cond_row_weights_layout():
    gen = small_gen_cfg()
    S = gen.n_stim
    w = tuple(float(i + 1) for i in range(S))
    cfg = CWGANConfig(gen=gen, cond_weight=w)
    rows = cwgan_lib.cond_row_weights(cfg, 2 * S)
    # condition-major rows: circuit 0's S conditions then circuit 1's
    np.testing.assert_allclose(np.asarray(rows), np.tile(w, 2))
    assert cwgan_lib.cond_row_weights(CWGANConfig(gen=gen), 2 * S) is None


def test_cwgan_fake_row_weights_per_circuit():
    """Rejection must mask ALL rows of a circuit with any failed condition
    (the dataset's survivor selection), not just the failed solve's row."""
    gen = small_gen_cfg()
    S = gen.n_stim
    cfg = CWGANConfig(gen=gen, reject_unconverged=True)

    class Out:
        converged = jnp.array([[True] * S, [True] + [False] * (S - 1)])

    w = np.asarray(cwgan_lib.fake_row_weights(cfg, Out()))
    assert w.shape == (2 * S,)
    np.testing.assert_allclose(w[:S], 1.0)  # fully-converged circuit kept
    np.testing.assert_allclose(w[S:], 0.0)  # partially-diverged: ALL rows out


def test_cwgan_critic_loss_cond_weighting():
    """With all weight on condition 0, the critic loss must ignore other
    conditions' scores entirely."""
    gen = small_gen_cfg()
    S = gen.n_stim
    w = (float(S),) + (0.0,) * (S - 1)  # mean 1, all mass on condition 0
    cfg = CWGANConfig(gen=gen, cond_weight=w, gp_lambda=0.0,
                      critic_layers=(8,), batch_size=2)
    key = jax.random.PRNGKey(0)
    params = __import__("tcgan_tpu.models.critic", fromlist=["x"]).init_params(
        cfg.critic_cfg, key)
    B = 2
    real = jax.random.normal(key, (B * S, gen.n_probe + 2))
    fake = jax.random.normal(jax.random.fold_in(key, 1), (B * S, gen.n_probe + 2))
    loss1, _ = cwgan_lib.critic_loss_fn(cfg, params, real, fake, key)
    # perturb a non-condition-0 row hugely: loss must not change
    fake2 = fake.at[1].set(fake[1] + 100.0)
    real2 = real.at[2].set(real[2] - 50.0)
    loss2, _ = cwgan_lib.critic_loss_fn(cfg, params, real2, fake2, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
