"""Cross-implementation test: C++ OpenMP solver vs the JAX while-loop solver
(the reference's 3-implementation consistency pattern, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.ops import fixed_point, native, stimulus, weights
from tcgan_tpu.ops.ssn import SSNConfig

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native solver not built"
)


def _problem():
    cfg = SSNConfig(N=8, k=0.01, n=2.2, dt=0.001, max_iter=20000, atol=1e-8)
    J = jnp.array([[0.05, 0.04], [0.05, 0.03]], dtype=jnp.float64) * 0.5
    D = jnp.array([[0.1, 0.08], [0.1, 0.08]], dtype=jnp.float64)
    Ssp = jnp.array([[0.25, 0.1], [0.25, 0.1]], dtype=jnp.float64)
    x = cfg.site_pos(dtype=jnp.float64)
    z = weights.sample_z(jax.random.PRNGKey(7), (4,), cfg.N, dtype=jnp.float64)
    W = weights.build_weight(J, D, Ssp, z, x)
    I = stimulus.stimulus_battery((0.25, 1.0), (5.0,), x, cfg.smoothness)
    return cfg, W, I


def test_native_matches_jax_solver():
    cfg, W, I = _problem()
    jres = fixed_point.solve_fixed_point(cfg, W, I)
    nres = native.solve_fixed_point_native(cfg, np.asarray(W), np.asarray(I))
    assert bool(jres.converged.all())
    assert nres.converged.all()
    np.testing.assert_allclose(nres.r, np.asarray(jres.r), rtol=1e-6, atol=1e-7)


def test_native_flags_divergence():
    cfg = SSNConfig(N=4, k=0.05, n=2.0, dt=0.001, max_iter=5000,
                    rate_stop_at=100.0)
    n2 = cfg.num_neurons
    W = 5.0 * np.abs(np.random.default_rng(0).normal(size=(1, n2, n2)))
    I = 30.0 * np.ones((1, 1, n2))
    res = native.solve_fixed_point_native(cfg, W, I)
    assert res.diverged.all()


def test_native_threads_reported():
    assert native.num_threads() >= 1


def test_native_rejects_mismatched_shapes():
    """The C solver indexes raw pointers; the wrapper must reject every
    batch/size mismatch (a 3-D I_ext with the wrong batch dim would read
    out of bounds inside C)."""
    cfg = SSNConfig(N=4, max_iter=100, atol=1e-4)
    n2 = cfg.num_neurons
    W = np.zeros((3, n2, n2))
    with pytest.raises(ValueError):
        native.solve_fixed_point_native(cfg, W, np.zeros((2, 2, n2)))
    with pytest.raises(ValueError):
        native.solve_fixed_point_native(cfg, W, np.zeros((3, 2, n2 + 2)))
    # size-1 batch dims broadcast like JAX
    res = native.solve_fixed_point_native(cfg, W, np.zeros((1, 2, n2)))
    assert res.r.shape == (3, 2, n2)
