"""Per-run uncertainty analysis (analysis.uncertainty): Fisher error bars
at a run's endpoint + truth-calibration z-scores.

Reference test analog: the smoke/integration tier (SURVEY.md §4) — the
capability itself is beyond the reference's point-fit analyzers."""

import json

import numpy as np

from tcgan_tpu.analysis import uncertainty
from tcgan_tpu.run import gan
from tests.test_cli import TINY_GAN


def _tiny_run(tmp_path):
    d = str(tmp_path / "g")
    rc = gan.main(TINY_GAN + ["--datastore", d])
    assert rc == 0
    return d


def test_uncertainty_cli_end_to_end(tmp_path):
    d = _tiny_run(tmp_path)
    out = tmp_path / "unc.json"
    rc = uncertainty.main([
        "--run", d, "--output", str(out),
        "--n-circuits", "16", "--n-boot", "32",
    ])
    assert rc == 0
    rep = json.loads(out.read_text())  # accepts Infinity tokens
    # config resolved from the run's info.json, not retyped
    assert rep["n_data"] == 8  # TINY_GAN --truth-samples
    stds = rep["expected_precision"]["per_param_std"]
    assert len(stds) == 12
    # the tiny battery has 4 moments for 12 params: flat directions MUST
    # exist (and with them, inf per-param marginals), while the Fisher
    # must constrain at least one DIRECTION with a finite std
    n_con = rep["expected_precision"]["n_constrained_directions"]
    assert 1 <= n_con <= 4
    assert np.isinf(np.asarray(list(stds.values()))).any()
    dir_stds = [d["std"] for d in rep["expected_precision"]["directions"]]
    assert sum(np.isfinite(dir_stds)) == n_con
    # fake-truth run: calibration against the recorded truth is present
    cal = rep["calibration"]
    assert set(cal["z_scores"]) == set(stds)
    assert len(cal["direction_z"]) == n_con
    assert np.isfinite(cal["max_abs_z_constrained"])
    assert "verdict" in cal
    # flat-marginal z-scores are 0 by convention (data never saw them)
    assert all(np.isfinite(list(cal["z_scores"].values())))
    assert "fit_decomposition" in rep


def test_uncertainty_npz_params_source(tmp_path):
    d = _tiny_run(tmp_path)
    rc = uncertainty.main([
        "--run", d, "--params-source", "npz",
        "--n-circuits", "16", "--n-boot", "16",
    ])
    assert rc == 0


def test_calibration_flags_optimization_failure():
    """A fit far off truth along a well-constrained direction must be
    called optimization-limited; a fit at truth information-limited."""
    # synthetic precision: axis-aligned directions, the 4 J params
    # constrained at std 0.01, everything else flat
    names = uncertainty.PARAM_NAMES
    precision = {
        "per_param_std": {n: (0.01 if i < 4 else float("inf"))
                          for i, n in enumerate(names)},
        "directions": [
            {"std": (0.01 if i < 4 else float("inf")),
             "direction": {m: float(m == n) for m in names}}
            for i, n in enumerate(names)
        ],
    }
    truth = {"J": np.full((2, 2), 0.02), "D": np.full((2, 2), 0.05),
             "S": np.full((2, 2), 0.25)}
    good = uncertainty.calibration(truth, truth, precision)
    assert good["within_error_bars"] and good["max_abs_z_constrained"] == 0.0
    off = {"J": np.full((2, 2), 0.03), "D": truth["D"], "S": truth["S"]}
    bad = uncertainty.calibration(off, truth, precision)
    assert not bad["within_error_bars"]
    assert "optimization-limited" in bad["verdict"]
    # the flat params (std=inf) contribute z=0 even when moved
    off_flat = {"J": truth["J"], "D": np.full((2, 2), 0.08), "S": truth["S"]}
    flat = uncertainty.calibration(off_flat, truth, precision)
    assert flat["max_abs_z_constrained"] == 0.0
