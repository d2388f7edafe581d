"""Weight-builder tests: Dale's law, block structure, differentiability.

Reference test analog: weight-matrix construction coverage around
``tc_gan/gradient_expressions/make_w_batch.py`` (SURVEY.md §2)."""

import jax
import jax.numpy as jnp
import numpy as np

from tcgan_tpu.ops import weights

J = jnp.array([[0.1, 0.06], [0.12, 0.05]])
D = jnp.array([[0.7, 0.5], [0.9, 0.4]])
S = jnp.array([[0.25, 0.09], [0.25, 0.09]])
N = 8


def _build(z=None, key=0):
    x = weights.site_positions(N)
    if z is None:
        z = weights.sample_z(jax.random.PRNGKey(key), (), N)
    return weights.build_weight(J, D, S, z, x), z


def test_shape_and_dale_sign():
    W, _ = _build()
    assert W.shape == (2 * N, 2 * N)
    Wn = np.asarray(W)
    assert np.all(Wn[:, :N] >= 0.0), "E (presynaptic) columns must be >= 0"
    assert np.all(Wn[:, N:] <= 0.0), "I (presynaptic) columns must be <= 0"


def test_zero_noise_block_structure():
    """With z == 0 each 2x2 block is J_ab * gaussian(distance)."""
    x = weights.site_positions(N)
    z = jnp.zeros((2 * N, 2 * N))
    W = np.asarray(weights.build_weight(J, D, S, z, x))
    xn = np.asarray(x)
    for a in range(2):
        for b in range(2):
            blk = W[a * N:(a + 1) * N, b * N:(b + 1) * N]
            d2 = (xn[:, None] - xn[None, :]) ** 2
            expected = float(J[a, b]) * np.exp(-d2 / (2 * float(S[a, b]) ** 2))
            if b == 1:
                expected = -expected
            np.testing.assert_allclose(blk, expected, rtol=1e-5, atol=1e-7)


def test_batched_leading_dims():
    x = weights.site_positions(N)
    z = weights.sample_z(jax.random.PRNGKey(1), (3, 2), N)
    W = weights.build_weight(J, D, S, z, x)
    assert W.shape == (3, 2, 2 * N, 2 * N)
    # each batch element matches the unbatched builder
    W00 = weights.build_weight(J, D, S, z[0, 0], x)
    np.testing.assert_allclose(np.asarray(W[0, 0]), np.asarray(W00), rtol=1e-6)


def test_gradients_flow_to_params():
    x = weights.site_positions(N)
    z = weights.sample_z(jax.random.PRNGKey(2), (), N)

    def loss(params):
        Jp, Dp, Sp = params
        W = weights.build_weight(Jp, Dp, Sp, z, x)
        return jnp.sum(W**2)

    g = jax.grad(loss)((J, D, S))
    for gi in g:
        assert np.all(np.isfinite(np.asarray(gi)))
    # J gradient should be nonzero in every block
    assert np.all(np.abs(np.asarray(g[0])) > 0)


def test_rectification_zeroes_strongly_negative_draws():
    x = weights.site_positions(N)
    z = jnp.full((2 * N, 2 * N), -100.0)  # J + D*z << 0 everywhere
    W = weights.build_weight(J, D, S, z, x)
    np.testing.assert_allclose(np.asarray(W), 0.0)
