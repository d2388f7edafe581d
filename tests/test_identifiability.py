"""Identifiability analysis: closed-form Dale-ensemble statistics vs Monte
Carlo, moment-Jacobian correctness vs finite differences, and the CLI."""

import json

import numpy as np
import pytest

from tcgan_tpu.analysis import identifiability as ident


def test_mean_and_var_rectified_strength_match_monte_carlo(rng):
    J = np.array([[0.045, 0.040], [0.050, 0.035]])
    D = np.array([[0.10, 0.08], [0.10, 0.08]])
    z = rng.normal(size=(200000, 1, 1))
    samp = np.maximum(J + D * z, 0.0)
    np.testing.assert_allclose(
        ident.mean_rectified_strength(J, D), samp.mean(axis=0), rtol=2e-2)
    np.testing.assert_allclose(
        ident.var_rectified_strength(J, D), samp.var(axis=0), rtol=5e-2)


def test_dale_ridge_direction_preserves_mean_strength():
    J, D = 0.045, 0.10
    d = ident.dale_ridge_direction(J, D)  # (dlogJ, dlogD)
    eps = 1e-4
    J2 = J * np.exp(eps * d[0])
    D2 = D * np.exp(eps * d[1])
    m0 = ident.mean_rectified_strength(J, D)
    m1 = ident.mean_rectified_strength(J2, D2)
    # first-order invariant along the ridge; a generic direction moves the
    # mean by O(eps * m0)
    assert abs(m1 - m0) < 1e-3 * eps * m0
    m_gen = ident.mean_rectified_strength(J * np.exp(eps), D)
    assert abs(m_gen - m0) > 0.3 * eps * m0


def _tiny_cfg():
    import jax.numpy as jnp

    from tcgan_tpu.models.generator import GeneratorConfig
    from tcgan_tpu.ops.ssn import SSNConfig

    return GeneratorConfig(
        ssn=SSNConfig(N=8, max_iter=4000, atol=1e-8, dt=0.001),
        bandwidths=(0.25, 1.0),
        contrasts=(5.0,),
        sample_sites=1,
        solver="ift",
        dtype=jnp.float64,  # FD check needs f64 headroom at atol=1e-8
    )


TRUE_J = ((0.045, 0.040), (0.050, 0.035))
TRUE_D = ((0.10, 0.08), (0.10, 0.08))
TRUE_S = ((0.25, 0.10), (0.25, 0.10))


def test_moment_jacobian_matches_finite_differences():
    import jax.numpy as jnp

    cfg = _tiny_cfg()
    jac, moments = ident.moment_jacobian(cfg, TRUE_J, TRUE_D, TRUE_S,
                                         n_circuits=16, seed=0)
    assert jac.shape == (len(moments), 12)
    assert np.all(np.isfinite(jac)) and np.any(jac != 0.0)

    # finite-difference check along two coordinate directions
    import jax

    from tcgan_tpu.ops import weights as weights_lib

    theta = np.concatenate([np.log(np.asarray(p).reshape(-1))
                            for p in (TRUE_J, TRUE_D, TRUE_S)])
    z = weights_lib.sample_z(jax.random.PRNGKey(0), (16,), cfg.ssn.N,
                             dtype=cfg.dtype)
    fn = jax.jit(lambda t: ident.moment_fn(cfg, t, z))
    eps = 1e-4
    for idx in (0, 5):
        e = np.zeros(12)
        e[idx] = eps
        fd = (np.asarray(fn(jnp.asarray(theta + e)))
              - np.asarray(fn(jnp.asarray(theta - e)))) / (2 * eps)
        np.testing.assert_allclose(jac[:, idx], fd, rtol=2e-3, atol=1e-7)


def test_identifiability_report_finds_planted_null_direction():
    # A synthetic Jacobian with a known null direction must be recovered.
    rng = np.random.default_rng(1)
    basis = rng.normal(size=(12, 12))
    q, _ = np.linalg.qr(basis)
    null = q[:, -1]
    rows = rng.normal(size=(40, 11)) @ q[:, :-1].T  # spans the complement
    rep = ident.identifiability_report(rows)
    got = np.array([rep["ridge_direction"][n] for n in ident.PARAM_NAMES])
    assert abs(np.dot(got, null)) > 0.999
    assert rep["sigma_min"] < 1e-10 * rep["singular_values"][0]


def test_identifiability_cli(tmp_path, capsys):
    out = tmp_path / "ident.json"
    rc = ident.main([
        "--N", "8", "--max-iter", "4000", "--atol", "1e-8", "--dt", "0.001",
        "--dtype", "float64",
        "--bandwidths", "0.25", "1.0", "--contrasts", "5.0",
        "--J", "0.045", "0.04", "0.05", "0.035",
        "--D", "0.1", "0.08", "0.1", "0.08",
        "--S", "0.25", "0.1", "0.25", "0.1",
        "--n-circuits", "8",
        "--contrast-sets", "5;2.5,5,10",
        "--fitted-J", "0.05", "0.04", "0.05", "0.035",
        "--fitted-D", "0.09", "0.08", "0.1", "0.08",
        "--fitted-S", "0.25", "0.1", "0.25", "0.1",
        "--output", str(out),
        "--save-jacobian", str(tmp_path / "jac.npz"),
        "--data-samples", "512",
    ])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert len(rep["batteries"]) == 2
    b0, b1 = rep["batteries"]
    # the spectrum always spans all 12 params (zero-padded past the moment
    # count), so a moment-deficient battery shows its EXACT null space:
    # 2bw x 1c -> 4 moments -> sigma_min is exactly 0, not the smallest of
    # 4 row-space values (the pre-round-3 bug ranked such batteries as
    # fully identifying)
    assert len(b0["singular_values"]) == 12
    assert len(b1["singular_values"]) == 12
    assert b0["sigma_min"] == 0.0
    assert b0["condition_number"] > 1e100
    # richer battery (2bw x 3c -> 12 moments): genuinely full rank
    assert np.isfinite(b1["sigma_min"])
    assert b1["singular_values"][0] > b1["sigma_min"] > 0
    assert rep["analytic_dale_ridge"]["mean_strength"][0][0] > 0
    dec = b0["fit_decomposition"]
    assert np.isfinite(dec["identifiable_error"])
    assert dec["raw_error"] > 0 and len(dec["components"]) == 12
    jac_npz = np.load(tmp_path / "jac.npz")
    assert jac_npz["jacobian"].shape == (4, 12)
    assert list(jac_npz["param_names"]) == list(ident.PARAM_NAMES)
    prec = b0["expected_precision"]
    assert prec["n_data"] == 512
    assert 0 < prec["n_constrained_directions"] <= 4  # 4 moments only


def test_subspace_errors_separates_ridge_from_identifiable():
    # Jacobian with a planted flat direction: error along it must land in
    # unidentifiable_error, error along a strong direction in identifiable.
    rng = np.random.default_rng(2)
    q, _ = np.linalg.qr(rng.normal(size=(12, 12)))
    flat, strong = q[:, -1], q[:, 0]
    jac = rng.normal(size=(30, 11)) @ q[:, :-1].T

    theta_true = np.log(np.full(12, 0.1))
    for direction, key in ((flat, "unidentifiable_error"),
                           (strong, "identifiable_error")):
        theta_fit = theta_true + 0.3 * direction
        blocks_t = {k: np.exp(theta_true[i * 4:(i + 1) * 4]).reshape(2, 2)
                    for i, k in enumerate(("J", "D", "S"))}
        blocks_f = {k: np.exp(theta_fit[i * 4:(i + 1) * 4]).reshape(2, 2)
                    for i, k in enumerate(("J", "D", "S"))}
        dec = ident.subspace_errors(jac, blocks_f, blocks_t)
        other = ("identifiable_error" if key == "unidentifiable_error"
                 else "unidentifiable_error")
        assert dec[key] > 10 * dec[other], (key, dec)
        assert dec["raw_error"] == pytest.approx(0.3 / np.sqrt(12), rel=1e-6)


def test_expected_precision_scaling_and_flat_directions():
    rng = np.random.default_rng(3)
    # planted: 11 informative directions, 1 flat
    q, _ = np.linalg.qr(rng.normal(size=(12, 12)))
    jac = rng.normal(size=(30, 11)) @ q[:, :-1].T
    C = np.eye(30)
    p1 = ident.expected_precision(jac, C, 1000)
    p2 = ident.expected_precision(jac, C, 4000)
    assert p1["n_constrained_directions"] == 11
    d1 = [d["std"] for d in p1["directions"] if np.isfinite(d["std"])]
    d2 = [d["std"] for d in p2["directions"] if np.isfinite(d["std"])]
    # CRLB scales as 1/sqrt(n)
    np.testing.assert_allclose(np.array(d1) / np.array(d2), 2.0, rtol=1e-6)
    # the flat direction is reported unconstrained
    flat = [d for d in p1["directions"] if not np.isfinite(d["std"])]
    assert len(flat) == 1
    got = np.array([flat[0]["direction"][n] for n in ident.PARAM_NAMES])
    assert abs(got @ q[:, -1]) > 0.999


def test_bootstrap_moment_cov_matches_theory_for_gaussian(rng):
    # mean of a Gaussian: cov(mean at N) = sigma^2/N -> unit-cov = sigma^2
    x = rng.normal(0.0, 2.0, size=(4000, 1))
    C = ident.bootstrap_moment_cov(x, n_boot=400, seed=1)
    assert C.shape == (2, 2)
    np.testing.assert_allclose(C[0, 0], 4.0, rtol=0.25)  # var of mean unit
    np.testing.assert_allclose(C[1, 1], 2.0, rtol=0.35)  # var of std ~ s^2/2


def test_identifiability_report_sees_exact_null_space():
    """A moment-deficient Jacobian (fewer moment rows than params) has an
    EXACT null space; the report must show sigma_min = 0 and a ridge
    direction inside it (reduced SVD hid both, ranking degenerate
    batteries as well-conditioned)."""
    from tcgan_tpu.analysis.identifiability import identifiability_report

    rng = np.random.RandomState(0)
    jac = rng.rand(5, 12)  # 5 moments, 12 params -> >= 7 null dims
    rep = identifiability_report(jac)
    assert len(rep["singular_values"]) == 12
    assert rep["sigma_min"] == 0.0
    assert rep["condition_number"] > 1e100  # effectively infinite
    ridge = np.array(list(rep["ridge_direction"].values()))
    np.testing.assert_allclose(jac @ ridge, 0.0, atol=1e-12)
