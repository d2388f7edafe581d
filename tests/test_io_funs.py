"""Unit tests for the SSN io nonlinearities (reference test analog:
``tc_gan/tests/test_ssnode.py`` io-function coverage, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.ops import io_funs

K, N_EXP, R0, R1 = 0.01, 2.2, 100.0, 200.0


@pytest.mark.parametrize("io_type", io_funs.IO_TYPES)
def test_shapes_and_nonnegativity(io_type):
    f = io_funs.make_io_fun(io_type, K, N_EXP, R0, R1)
    u = jnp.linspace(-50.0, 400.0, 97).reshape(97, 1) * jnp.ones((1, 3))
    out = f(u)
    assert out.shape == u.shape
    assert np.all(np.asarray(out) >= 0.0)
    # zero below threshold
    assert np.allclose(np.asarray(f(jnp.array([-1.0, -100.0]))), 0.0)


@pytest.mark.parametrize("io_type", io_funs.IO_TYPES)
def test_monotone_nondecreasing(io_type):
    f = io_funs.make_io_fun(io_type, K, N_EXP, R0, R1)
    u = jnp.linspace(-10.0, 500.0, 2001)
    out = np.asarray(f(u))
    # tolerance: float32 rounding of the power law at large u gives ulp-level
    # wiggles (~1e-4 relative)
    assert np.all(np.diff(out) >= -1e-4 * np.maximum(out[1:], 1.0))


def test_power_matches_formula():
    u = jnp.array([0.0, 1.0, 2.0, 10.0])
    out = np.asarray(io_funs.asym_power(u, K, N_EXP))
    np.testing.assert_allclose(
        out, K * np.maximum(np.asarray(u), 0) ** N_EXP, rtol=1e-4
    )


def test_tanh_saturates_below_hard_bound():
    f = io_funs.make_io_fun("asym_tanh", K, N_EXP, R0, R1)
    # never exceeds the hard bound (tanh saturates to exactly 1.0 in f32)
    out = np.asarray(f(jnp.array([1e4, 1e6])))
    assert np.all(out <= R1 + 1e-3)
    # strictly between soft and hard bound for moderately superthreshold u:
    # pick u with power-law rate ~1.5*r0
    u_mid = float(io_funs.rate_to_volt(1.5 * R0, K, N_EXP))
    mid = float(f(jnp.array([u_mid]))[0])
    assert R0 < mid < R1


@pytest.mark.parametrize("io_type", io_funs.IO_TYPES)
def test_continuity_at_soft_bound(io_type):
    """All variants agree with the pure power law below r0 and are continuous
    at the crossover."""
    f = io_funs.make_io_fun(io_type, K, N_EXP, R0, R1)
    u0 = float(io_funs.rate_to_volt(R0, K, N_EXP))
    below = np.asarray(f(jnp.array([u0 * 0.5])))
    np.testing.assert_allclose(
        below, np.asarray(io_funs.asym_power(jnp.array([u0 * 0.5]), K, N_EXP)), rtol=1e-6
    )
    eps = 1e-4
    lo = float(f(jnp.array([u0 - eps]))[0])
    hi = float(f(jnp.array([u0 + eps]))[0])
    assert abs(hi - lo) < 1e-1


@pytest.mark.parametrize("io_type", io_funs.IO_TYPES)
def test_closed_form_deriv_matches_autodiff(io_type):
    f = io_funs.make_io_fun(io_type, K, N_EXP, R0, R1)
    df = io_funs.make_io_deriv(io_type, K, N_EXP, R0, R1)
    us = jnp.array([0.5, 1.0, 5.0, 50.0, 200.0, 1000.0])
    auto = jax.vmap(jax.grad(lambda u: f(u)))(us)
    np.testing.assert_allclose(np.asarray(df(us)), np.asarray(auto), rtol=1e-4)


def test_rate_to_volt_roundtrip():
    r = jnp.array([0.1, 1.0, 10.0, 99.0])
    u = io_funs.rate_to_volt(r, K, N_EXP)
    np.testing.assert_allclose(
        np.asarray(io_funs.asym_power(u, K, N_EXP)), np.asarray(r), rtol=1e-5
    )
