"""Moment-matching unit tests: survivor-mask semantics, soft-weight
moment estimates, and the absorbing-state fallback (folded from the
round-numbered grab-bag per VERDICT r3 #7). The end-to-end mm recovery
tests live in test_recovery_slow.py."""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from tcgan_tpu.models import moments as mm_lib
from tests.test_wgan import small_gen_cfg


def test_moments_survivor_mask_flag():
    gen = small_gen_cfg()
    cfg_on = mm_lib.MomentMatchingConfig(gen=gen, batch_size=4)
    cfg_off = dataclasses.replace(cfg_on, survivor_mask=False)
    assert cfg_on.survivor_mask and not cfg_off.survivor_mask

    class Out:
        converged = jnp.array([[True, True, True, True],
                               [True, False, True, True],
                               [True, True, True, True],
                               [False, False, False, False]])

    m = np.asarray(mm_lib.sample_mask(cfg_on, Out()))
    np.testing.assert_allclose(m, [1.0, 0.0, 1.0, 0.0])


def test_data_moments_soft_weights_unbiased():
    """Soft survivor weights summing below 1 must not bias the weighted
    moments (the old n = max(sum(w), 1.0) clamp scaled them by sum(w))."""
    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.rand(8, 5))
    m_full, s_full = mm_lib.data_moments(tc)
    m_soft, s_soft = mm_lib.data_moments(tc, 0.1 * jnp.ones(8))
    np.testing.assert_allclose(np.asarray(m_soft), np.asarray(m_full),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_soft), np.asarray(s_full),
                               rtol=1e-6)


def test_mm_sample_mask_absorbing_state_fallback():
    """The mm survivor mask falls back to soft per-circuit weights when NO
    circuit fully converged (all-zero weights would freeze a fixed_z
    objective permanently — the rec13anchor absorbing state, previously
    fixed only for the WGAN family)."""
    cfg = mm_lib.MomentMatchingConfig(gen=small_gen_cfg())
    S = cfg.gen.n_stim
    conv = jnp.zeros((3, S), bool).at[:, 0].set(True)  # no full survivor
    w = np.asarray(mm_lib.sample_mask(cfg, SimpleNamespace(converged=conv)))
    assert w.sum() > 0  # soft fallback active
    np.testing.assert_allclose(w, 1.0 / S)
    # strict semantics resume once any circuit fully converges
    conv2 = conv.at[1].set(True)
    w2 = np.asarray(mm_lib.sample_mask(cfg, SimpleNamespace(converged=conv2)))
    np.testing.assert_allclose(w2, [0.0, 1.0, 0.0])
