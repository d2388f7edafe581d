"""Dataset-loading tests: .npz/.npy/.mat formats and minibatch sampling
(SURVEY.md §2 "Data loading / truth generation")."""

import jax
import numpy as np
import pytest

from tcgan_tpu.data.datasets import load_tuning_curves


@pytest.fixture
def tc():
    return np.random.default_rng(0).normal(size=(37, 6)).astype(np.float32) + 2


def test_npz_roundtrip(tmp_path, tc):
    p = tmp_path / "d.npz"
    np.savez(p, tuning_curves=tc)
    np.testing.assert_allclose(load_tuning_curves(p), tc)


def test_npz_fallback_first_array(tmp_path, tc):
    p = tmp_path / "d.npz"
    np.savez(p, whatever=tc)
    np.testing.assert_allclose(load_tuning_curves(p), tc)


def test_npy_roundtrip(tmp_path, tc):
    p = tmp_path / "d.npy"
    np.save(p, tc)
    np.testing.assert_allclose(load_tuning_curves(p), tc)


def test_mat_roundtrip(tmp_path, tc):
    """MATLAB v5 — the reference's native dataset format."""
    from scipy.io import savemat

    p = tmp_path / "d.mat"
    savemat(p, {"tuning_curves": tc})
    np.testing.assert_allclose(load_tuning_curves(p), tc, rtol=1e-6)


def test_unsupported_suffix_raises(tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("1,2\n")
    with pytest.raises(ValueError):
        load_tuning_curves(p)


def test_mat_loader_requires_unambiguous_variable(tmp_path):
    scipy = pytest.importorskip("scipy.io")

    tc = np.arange(12.0).reshape(3, 4)
    # named key wins even among several variables
    scipy.savemat(tmp_path / "named.mat", {"meta": np.ones((1, 1)),
                                           "tuning_curves": tc})
    np.testing.assert_allclose(load_tuning_curves(tmp_path / "named.mat"), tc)
    # single unnamed variable is unambiguous
    scipy.savemat(tmp_path / "single.mat", {"whatever": tc})
    np.testing.assert_allclose(load_tuning_curves(tmp_path / "single.mat"), tc)
    # several unnamed variables: refuse rather than guess
    scipy.savemat(tmp_path / "ambig.mat", {"a": np.ones((1, 1)), "b": tc})
    with pytest.raises(ValueError):
        load_tuning_curves(tmp_path / "ambig.mat")
