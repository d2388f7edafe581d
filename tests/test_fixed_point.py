"""Fixed-point solver tests: golden linear solution, flags, cross-check with
the unrolled Euler path (the reference's cross-implementation pattern,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.ops import euler, fixed_point, weights, stimulus
from tcgan_tpu.ops.ssn import SSNConfig


def _small_cfg(**kw):
    base = dict(N=8, k=0.01, n=2.2, dt=0.001, max_iter=20000, atol=1e-6)
    base.update(kw)
    return SSNConfig(**base)


def _random_problem(cfg, key=0, batch=(), S=3, scale=0.5, contrast=5.0):
    """A weakly-coupled (hence provably stable) random circuit in float64."""
    kz, ki = jax.random.split(jax.random.PRNGKey(key))
    J = jnp.array([[0.05, 0.04], [0.05, 0.03]], dtype=jnp.float64) * scale
    D = jnp.array([[0.1, 0.08], [0.1, 0.08]], dtype=jnp.float64)
    Ssp = jnp.array([[0.25, 0.1], [0.25, 0.1]], dtype=jnp.float64)
    x = cfg.site_pos(dtype=jnp.float64)
    z = weights.sample_z(kz, batch, cfg.N, dtype=jnp.float64)
    W = weights.build_weight(J, D, Ssp, z, x)
    I = stimulus.stimulus_battery(
        (0.25, 0.5, 1.0)[:S], (contrast,), x, cfg.smoothness
    )
    return W, I


def test_golden_linear_fixed_point():
    """n=1 power law with an all-positive solution has the closed form
    r* = k (I - k W)^{-1} I_ext — implementation-independent golden value."""
    cfg = _small_cfg(n=1.0, k=0.05, max_iter=100000, atol=1e-9)
    W, I = _random_problem(cfg, contrast=20.0)
    res = fixed_point.solve_fixed_point(cfg, W, I)
    assert bool(jnp.all(res.converged))
    Wn, In = np.asarray(W, dtype=np.float64), np.asarray(I, dtype=np.float64)
    n2 = Wn.shape[-1]
    golden = np.stack(
        [np.linalg.solve(np.eye(n2) - cfg.k * Wn, cfg.k * In[s]) for s in range(In.shape[0])]
    )
    assert np.all(golden > 0), "test setup must give an interior solution"
    np.testing.assert_allclose(np.asarray(res.r), golden, rtol=1e-3, atol=1e-5)


def test_converges_on_stable_circuit():
    cfg = _small_cfg()
    W, I = _random_problem(cfg)
    res = fixed_point.solve_fixed_point(cfg, W, I)
    assert bool(jnp.all(res.converged))
    assert not bool(jnp.any(res.diverged))
    assert np.all(np.asarray(res.iters) < cfg.max_iter)
    # residual is genuinely small
    f = cfg.io_fun()
    u = jnp.einsum("ij,sj->si", W, res.r) + I
    resid = np.max(np.abs(np.asarray(-res.r + f(u))))
    assert resid < cfg.atol * 1.01


def test_divergence_flagging():
    """A strongly self-exciting circuit with supralinear io must diverge."""
    cfg = _small_cfg(n=2.0, k=0.05, rate_stop_at=100.0)
    n2 = cfg.num_neurons
    W = 5.0 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n2, n2)))
    I = 30.0 * jnp.ones((1, n2))
    res = fixed_point.solve_fixed_point(cfg, W, I)
    assert bool(jnp.all(res.diverged))
    assert not bool(jnp.any(res.converged))


def test_check_every_equivalence():
    cfg = _small_cfg()
    W, I = _random_problem(cfg)
    r1 = fixed_point.solve_fixed_point(cfg, W, I, check_every=1)
    r5 = fixed_point.solve_fixed_point(cfg, W, I, check_every=5)
    assert bool(jnp.all(r5.converged))
    np.testing.assert_allclose(np.asarray(r1.r), np.asarray(r5.r), atol=5e-4)


def test_euler_scan_matches_while_loop():
    """Cross-implementation: unrolled scan (BPTT path) lands on the same
    fixed point as the while_loop solver."""
    cfg = _small_cfg(seqlen=6000)
    W, I = _random_problem(cfg)
    fp = fixed_point.solve_fixed_point(cfg, W, I)
    dyn = euler.solve_dynamics(cfg, W, I)
    assert bool(jnp.all(dyn.converged))
    np.testing.assert_allclose(np.asarray(fp.r), np.asarray(dyn.r), atol=1e-4)


def test_checkpointed_scan_matches_plain():
    cfg = _small_cfg(seqlen=2000)
    W, I = _random_problem(cfg)
    plain = euler.solve_dynamics(cfg, W, I)
    remat = euler.solve_dynamics(cfg, W, I, checkpoint_chunk=100)
    np.testing.assert_allclose(np.asarray(plain.r), np.asarray(remat.r), rtol=1e-6)


def test_batched_and_vmap_consistency():
    cfg = _small_cfg()
    W, I = _random_problem(cfg, batch=(4,))
    res = fixed_point.solve_fixed_point(cfg, W, I)
    assert res.r.shape == (4, 3, cfg.num_neurons)
    res0 = fixed_point.solve_fixed_point(cfg, W[0], I)
    np.testing.assert_allclose(np.asarray(res.r[0]), np.asarray(res0.r), atol=1e-6)


def test_bptt_gradient_flows():
    cfg = _small_cfg(seqlen=300)
    W, I = _random_problem(cfg)

    def loss(W):
        res = euler.solve_dynamics(cfg, W, I, checkpoint_chunk=50)
        return jnp.sum(res.r)

    g = jax.grad(loss)(W)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_expo_stepper_same_fixed_point_bigger_dt():
    """Exponential Euler reaches the same fixed point, and stays stable at a
    dt where plain Euler oscillates/diverges (dt = 2*tau_I)."""
    import dataclasses

    cfg = _small_cfg()
    W, I = _random_problem(cfg)
    ref = fixed_point.solve_fixed_point(cfg, W, I)
    assert bool(ref.converged.all())

    big_dt = 2.0 * cfg.tau_I
    cfg_expo = dataclasses.replace(cfg, stepper="expo", dt=big_dt,
                                   max_iter=4000)
    res = fixed_point.solve_fixed_point(cfg_expo, W, I)
    assert bool(res.converged.all()), "expo must be stable at dt = 2 tau_I"
    np.testing.assert_allclose(np.asarray(res.r), np.asarray(ref.r),
                               rtol=1e-4, atol=1e-5)
    # and it should be much cheaper: fewer iterations than euler at small dt
    assert int(res.iters.max()) < int(ref.iters.max()) / 2


def test_trajectory_and_rate_clipping():
    cfg = _small_cfg(seqlen=100)
    W, I = _random_problem(cfg)
    res, traj = euler.solve_dynamics(cfg, W, I, return_trajectory=True)
    assert traj.shape == (100,) + res.r.shape
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(res.r))
    # clipping: divergent circuit saturates at clip_factor * rate_stop_at
    n2 = cfg.num_neurons
    W_bad = 5.0 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (n2, n2)))
    bad = euler.solve_dynamics(cfg, W_bad, 30.0 * jnp.ones((1, n2)),
                               seqlen=500, clip_factor=3.0)
    assert bool(bad.diverged.all())
    assert float(bad.r.max()) <= 3.0 * cfg.rate_stop_at + 1e-6
    assert np.isfinite(np.asarray(bad.r)).all()


def test_feedforward_init_same_fixed_point_fewer_iters():
    import dataclasses

    cfg = _small_cfg()
    W, I = _random_problem(cfg)
    ref = fixed_point.solve_fixed_point(cfg, W, I)
    cfg_ff = dataclasses.replace(cfg, init="feedforward")
    res = fixed_point.solve_fixed_point(cfg_ff, W, I)
    assert bool(res.converged.all())
    np.testing.assert_allclose(np.asarray(res.r), np.asarray(ref.r),
                               rtol=1e-5, atol=1e-7)
    assert int(res.iters.max()) < int(ref.iters.max())


def test_anderson_same_fixed_point_fewer_iters():
    """Anderson(1) chunk acceleration reaches the identical fixed point
    (same residual criterion) in fewer iterations on a strongly-coupled
    circuit, and keeps divergence flagging intact."""
    import dataclasses

    cfg = _small_cfg(check_every=8)
    W, I = _random_problem(cfg, scale=1.0, contrast=10.0)
    ref = fixed_point.solve_fixed_point(cfg, W, I, check_every=8)
    assert bool(ref.converged.all())

    cfg_aa = dataclasses.replace(cfg, accel="anderson")
    res = fixed_point.solve_fixed_point(cfg_aa, W, I, check_every=8)
    assert bool(res.converged.all())
    np.testing.assert_allclose(np.asarray(res.r), np.asarray(ref.r),
                               rtol=1e-4, atol=1e-6)
    assert int(res.iters.max()) < int(ref.iters.max()), (
        int(res.iters.max()), int(ref.iters.max()))

    # divergence detection unchanged on a hostile circuit
    n2 = cfg.num_neurons
    W_bad = 5.0 * jnp.abs(jax.random.normal(jax.random.PRNGKey(1),
                                            (n2, n2), dtype=jnp.float64))
    bad = fixed_point.solve_fixed_point(
        dataclasses.replace(cfg_aa, max_iter=2000), W_bad,
        30.0 * jnp.ones((1, n2), dtype=jnp.float64), check_every=8)
    assert bool(bad.diverged.all())


def test_anderson_preserves_ift_gradients_and_saturating_io():
    """The accelerated forward reaches the same fixed point, so IFT
    gradients through it must match the unaccelerated solve; also holds
    for the saturating io type."""
    import dataclasses

    import jax

    from tcgan_tpu.ops import ift

    for io_type in ("asym_power", "asym_tanh"):
        cfg = _small_cfg(check_every=8, io_type=io_type)
        W, I = _random_problem(cfg)

        def loss(cfg_):
            res = ift.solve_fixed_point_implicit(cfg_, W, I)
            return jnp.sum(res.r**2)

        g_ref = jax.grad(lambda w: jnp.sum(
            ift.solve_fixed_point_implicit(cfg, w, I).r**2))(W)
        cfg_aa = dataclasses.replace(cfg, accel="anderson")
        g_aa = jax.grad(lambda w: jnp.sum(
            ift.solve_fixed_point_implicit(cfg_aa, w, I).r**2))(W)
        np.testing.assert_allclose(np.asarray(g_aa), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-8)


def test_euler_transient_exceedance_flags_divergence():
    """BPTT/Euler divergence is decided on FIRST exceedance of
    rate_stop_at (like the fixed-point and C solvers), not on the final
    state: a trajectory that starts above the ceiling and relaxes below
    it was clip-distorted and must be flagged diverged, or sample
    acceptance becomes solver-dependent."""
    cfg = _small_cfg(n=2.0, k=0.05, rate_stop_at=50.0, seqlen=4000)
    n2 = cfg.num_neurons
    W = jnp.zeros((n2, n2), jnp.float64)  # pure decay toward f(I)
    I = 5.0 * jnp.ones((1, n2), jnp.float64)
    r0 = jnp.full((1, n2), 80.0, jnp.float64)  # starts ABOVE the ceiling
    res = euler.solve_dynamics(cfg, W, I, r0=r0)
    # final state is small (decayed well below the ceiling)...
    assert float(res.r.max()) < cfg.rate_stop_at
    # ...but the trajectory exceeded it: diverged, not converged
    assert bool(res.diverged.all())
    assert not bool(res.converged.any())
    # control: the same problem from r0=0 never exceeds and converges
    res2 = euler.solve_dynamics(cfg, W, I)
    assert bool(res2.converged.all()) and not bool(res2.diverged.any())


def test_recorded_iters_never_exceed_max_iter():
    """When check_every does not divide max_iter the final chunk may run
    past the budget; recorded iters must be clamped so that
    'iters >= max_iter' keeps meaning unresolved."""
    cfg = _small_cfg()
    W, I = _random_problem(cfg)
    ref = fixed_point.solve_fixed_point(cfg, W, I, check_every=1)
    assert bool(ref.converged.all())
    n0 = int(np.asarray(ref.iters).max())
    # budget one below the needed count, chunk size 7: the solver resolves
    # inside the overshooting final chunk
    cfg2 = _small_cfg(max_iter=n0 - 1)
    out = fixed_point.solve_fixed_point(cfg2, W, I, check_every=7)
    assert int(np.asarray(out.iters).max()) <= cfg2.max_iter
    assert bool(out.converged.any())  # resolved in the overshoot window


def test_ssn_config_validates_accel_and_init():
    """accel/init are compared by string downstream; typos must raise
    instead of silently falling back to plain iteration / zero init."""
    with pytest.raises(ValueError):
        SSNConfig(N=4, accel="andersen")
    with pytest.raises(ValueError):
        SSNConfig(N=4, init="feedfoward")
    SSNConfig(N=4, accel="anderson", init="feedforward")  # valid spellings


def test_asym_tanh_requires_saturation_band():
    """Zero-width (soft, hard) band divides by zero in both the JAX and C
    io implementations — must be rejected at config time."""
    with pytest.raises(ValueError):
        SSNConfig(N=4, io_type="asym_tanh", rate_soft_bound=100.0,
                  rate_hard_bound=100.0)
    SSNConfig(N=4, io_type="asym_tanh", rate_soft_bound=100.0,
              rate_hard_bound=200.0)  # valid
