"""Stimulus-battery tests (reference analog: BandwidthContrastStimulator
coverage in ``tc_gan/networks/tests/``, SURVEY.md §2/§4)."""

import jax.numpy as jnp
import numpy as np

from tcgan_tpu.ops import stimulus, weights

N = 16
X = weights.site_positions(N)
BW = (0.25, 0.5, 1.0)
CT = (5.0, 20.0)
SM = 0.03125


def test_battery_shape_and_ordering():
    I = stimulus.stimulus_battery(BW, CT, X, SM)
    assert I.shape == (len(BW) * len(CT), 2 * N)
    # E and I halves identical
    np.testing.assert_allclose(np.asarray(I[:, :N]), np.asarray(I[:, N:]))
    # condition s = ic * n_b + ib scales linearly with contrast
    In = np.asarray(I)
    np.testing.assert_allclose(In[3:6] * (CT[0] / CT[1]), In[0:3], rtol=1e-5)


def test_range_and_center_peak():
    I = np.asarray(stimulus.stimulus_battery(BW, CT, X, SM))
    assert np.all(I >= 0.0)
    assert np.all(I <= max(CT) + 1e-6)
    # wide bar at high contrast nearly saturates at the center
    center = I[-1, : N][N // 2]
    assert center > 0.9 * max(CT)


def test_monotone_in_bandwidth():
    I = np.asarray(stimulus.stimulus_battery(BW, (1.0,), X, SM))
    # at every site, wider bars give >= input
    assert np.all(np.diff(I[:, :N], axis=0) >= -1e-6)


def test_edge_smoothing():
    """Input decays smoothly across the bar edge, centered at |x| = b/2."""
    b = 0.5
    I = np.asarray(stimulus.stimulus_battery((b,), (1.0,), X, SM))[0, :N]
    xn = np.abs(np.asarray(X))
    inside = I[xn < b / 2 - 4 * SM]
    outside = I[xn > b / 2 + 4 * SM]
    assert np.all(inside > 0.95)
    assert np.all(outside < 0.05)


def test_condition_features_ordering():
    F = np.asarray(stimulus.condition_features(BW, CT))
    assert F.shape == (len(BW) * len(CT), 2)
    np.testing.assert_allclose(F[:, 0], np.tile(BW, len(CT)))
    np.testing.assert_allclose(F[:, 1], np.repeat(CT, len(BW)))
