"""Analyzer-layer tests: TC-distribution grid, multi-run comparison,
metrics (SURVEY.md §2 "Analyzers / loaders")."""

import json

import numpy as np

from tcgan_tpu.analysis.compare import load_runs, plot_comparison, summarize
from tcgan_tpu.analysis.metrics import (
    param_recovery_error, sliced_w1, tc_w1, w1_per_feature,
)
from tcgan_tpu.analysis.tc_grid import per_condition_w1, plot_tc_grid


def test_w1_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 4))
    assert tc_w1(a, a.copy()) < 1e-12
    assert sliced_w1(a, a.copy()) < 1e-12


def test_w1_detects_mean_shift():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2000, 3))
    b = a + np.array([1.0, 0.0, 0.0])
    w = w1_per_feature(a, b)
    assert abs(w[0] - 1.0) < 0.05
    assert w[1] < 0.05 and w[2] < 0.05


def test_tc_grid_writes_figure_and_w1(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.normal(size=(300, 6)) + 2.0
    gen = rng.normal(size=(200, 6)) + np.array([2, 2, 2, 2.5, 2, 2])
    labels = [(0.25, 5.0), (0.5, 5.0), (1.0, 5.0),
              (0.25, 10.0), (0.5, 10.0), (1.0, 10.0)]
    w1s = plot_tc_grid(gen, data, labels, tmp_path / "grid.png")
    assert (tmp_path / "grid.png").exists()
    assert w1s.shape == (6,)
    assert w1s[3] > 0.3  # the shifted condition stands out
    np.testing.assert_allclose(w1s, per_condition_w1(gen, data))


def _fake_run(tmp_path, name, j_final):
    d = tmp_path / name
    d.mkdir()
    (d / "info.json").write_text(json.dumps({"status": "finished"}))
    steps = np.arange(5)
    lrn = ["step,d_loss,g_loss,wasserstein,frac_converged,frac_diverged"]
    for s in steps:
        lrn.append(f"{s},{0.5 - 0.05 * s},{0.2},{0.1},{1.0},{0.0}")
    (d / "learning.csv").write_text("\n".join(lrn) + "\n")
    cols = ["step"] + [f"{n}_{a}{b}" for n in "JDS"
                       for a in "EI" for b in "EI"]
    rows = [",".join(cols)]
    for s in steps:
        vals = [str(s)] + [str(j_final)] * 4 + ["0.1"] * 8
        rows.append(",".join(vals))
    (d / "generator.csv").write_text("\n".join(rows) + "\n")
    return d


def test_compare_runs_loads_plots_and_summarizes(tmp_path):
    d1 = _fake_run(tmp_path, "runA", 0.05)
    d2 = _fake_run(tmp_path, "runB", 0.03)
    recs = load_runs([d1, d2])
    assert len(recs) == 2
    out = tmp_path / "cmp.png"
    true = {"J": ((0.05, 0.05), (0.05, 0.05)),
            "D": ((0.1, 0.1), (0.1, 0.1)),
            "S": ((0.1, 0.1), (0.1, 0.1))}
    plot_comparison(recs, out, true_params=true)
    assert out.exists()
    summary = summarize(recs, true_params=true)
    assert summary["runA"]["param_recovery_error"]["J"] < 1e-9
    assert summary["runB"]["param_recovery_error"]["J"] > 0.3
    assert summary["runA"]["final"]["d_loss"] == 0.3


def test_compare_cli(tmp_path, capsys):
    from tcgan_tpu.analysis import compare

    d1 = _fake_run(tmp_path, "r1", 0.05)
    d2 = _fake_run(tmp_path, "r2", 0.04)
    rc = compare.main([str(d1), str(d2), "-o", str(tmp_path / "c.png"),
                       "--true-J", "0.05", "0.05", "0.05", "0.05"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().split("\n")[-1])
    assert "r1" in out["runs"] and "r2" in out["runs"]
    assert (tmp_path / "c.png").exists()


def test_param_recovery_error_basics():
    t = {"J": np.eye(2)}
    assert param_recovery_error({"J": np.eye(2)}, t)["J"] < 1e-12
    assert abs(param_recovery_error({"J": 2 * np.eye(2)}, t)["J"] - 1.0) < 1e-12


def test_fit_quality_cli(tmp_path, capsys):
    """The one-page fit-quality figure renders from a run dir, reads truth
    from info.json, and folds in eval TC samples when present."""
    from tcgan_tpu.analysis import fit_quality

    d = _fake_run(tmp_path, "fq", 0.05)
    (d / "info.json").write_text(json.dumps({
        "config": {"true_J": [0.05, 0.05, 0.05, 0.05],
                   "true_D": None, "true_S": None, "dataset": None}}))
    ev = tmp_path / "fq_eval"
    ev.mkdir()
    rng = np.random.default_rng(0)
    np.savez(ev / "eval_tuning_curves.npz",
             gen_tc=rng.normal(size=(100, 4)) + 1.0,
             data_tc=rng.normal(size=(150, 4)) + 1.0)
    jac_path = tmp_path / "jac.npz"
    np.savez(jac_path, jacobian=rng.normal(size=(16, 12)),
             moments=np.ones(16))
    rc = fit_quality.main([str(d), "--eval", str(ev),
                           "--jacobian", str(jac_path),
                           "-o", str(tmp_path / "fq.png")])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().split("\n")[-1])
    assert (tmp_path / "fq.png").exists()
    assert out["param_recovery_error"]["J"] < 1e-9  # truth == fitted
    assert np.isfinite(out["tc_w1"]) and np.isfinite(out["sliced_w1"])
    assert np.isfinite(out["subspace"]["identifiable_error"])
    assert out["subspace"]["n_identifiable"] <= 12


def test_report_cli(tmp_path, capsys):
    """The markdown run report renders recovery vs info.json truth, the
    training-health table, an embedded eval JSON, and the 10% gate
    verdict."""
    from tcgan_tpu.analysis import report

    d = _fake_run(tmp_path, "rep", 0.05)
    (d / "info.json").write_text(json.dumps({
        "config": {"entry": "wgan", "N": 17, "batch_size": 8,
                   "true_J": [0.05, 0.05, 0.05, 0.05],
                   "true_D": [0.1, 0.1, 0.1, 0.1],
                   "true_S": [0.1, 0.1, 0.1, 0.1], "dataset": None}}))
    ev = tmp_path / "rep_eval.json"
    ev.write_text(json.dumps({"tc_w1": 0.0123, "n_samples": 99}))
    out_md = tmp_path / "rep.md"
    rc = report.main([str(d), "-o", str(out_md), "--eval-json", str(ev)])
    assert rc == 0
    text = out_md.read_text()
    # fixture: J fitted == truth exactly; D fitted 0.1 == truth -> recovered
    assert "**recovered** (all blocks" in text
    assert "| J_EE | 0.05 | 0.05 | 0.0% |" in text
    assert "## Training health" in text and "| critic loss (d_loss) |" in text
    assert "| tc_w1 | 0.0123 |" in text
    assert "learning.csv" in text  # artifact inventory
    # missing run dir is a clean error, not a traceback
    assert report.main([str(tmp_path / "nope")]) == 2


def test_report_ensemble(tmp_path):
    """report auto-detects an ensemble datastore and renders the member
    recovery table, the 10% gate tally, and the seed-spread table."""
    from tcgan_tpu.analysis import report

    d = tmp_path / "ens"
    d.mkdir()
    (d / "info.json").write_text(json.dumps({
        "config": {"estimator": "mm", "N": 17}}))
    cols = ["member", "step"] + [f"{n}_{a}{b}" for n in "JDS"
                                 for a in "EI" for b in "EI"]
    rows = [",".join(cols)]
    for m in range(2):
        for s in range(3):
            rows.append(",".join([str(m), str(s)] + ["0.05"] * 12))
    (d / "ensemble.csv").write_text("\n".join(rows) + "\n")
    members = [
        {"J": [[0.05] * 2] * 2, "D": [[0.1] * 2] * 2, "S": [[0.1] * 2] * 2,
         "recovery_error": {"J": 0.02, "D": 0.05, "S": 0.01}},
        {"J": [[0.08] * 2] * 2, "D": [[0.1] * 2] * 2, "S": [[0.1] * 2] * 2,
         "recovery_error": {"J": 0.60, "D": 0.05, "S": 0.01}},
    ]
    (d / "ensemble_summary.json").write_text(json.dumps({
        "n_members": 2, "members": members,
        "mean": {k: [[0.1] * 2] * 2 for k in "JDS"},
        "std": {k: [[0.01] * 2] * 2 for k in "JDS"}}))
    out_md = tmp_path / "ens.md"
    assert report.main([str(d), "-o", str(out_md)]) == 0
    text = out_md.read_text()
    assert "# Ensemble report" in text
    assert "| 0 | 2 | 2.0% | 5.0% | 1.0% | **5.0%** |" in text
    assert "Members recovered at the 10% gate: **1/2**" in text
    assert "## Across-member spread" in text

    # a member that aborted mid-write (no recovery_error) degrades to an
    # em-dash row instead of KeyError-ing the whole report (ADVICE r3 #4)
    del members[1]["recovery_error"]
    (d / "ensemble_summary.json").write_text(json.dumps({
        "n_members": 2, "members": members,
        "mean": {k: [[0.1] * 2] * 2 for k in "JDS"},
        "std": {k: [[0.01] * 2] * 2 for k in "JDS"}}))
    assert report.main([str(d), "-o", str(out_md)]) == 0
    text = out_md.read_text()
    assert "| 0 | 2 | 2.0% | 5.0% | 1.0% | **5.0%** |" in text
    assert "| 1 | 2 | — | — | — | — |" in text
    assert "Members recovered at the 10% gate: **1/2**" in text


def test_recovery_gate(tmp_path, capsys):
    """The gate clears only when BOTH J and D hold within tolerance across
    the whole trailing window past min-step; truth defaults to the run's
    info.json. --window is in STEPS regardless of recorder cadence
    (rows here are 100 steps apart)."""
    from tcgan_tpu.analysis import recovery_gate

    d = tmp_path / "gate"
    d.mkdir()
    (d / "info.json").write_text(json.dumps({
        "config": {"true_J": [0.05] * 4, "true_D": [0.1] * 4,
                   "true_S": [0.1] * 4, "dataset": None}}))
    cols = ["step"] + [f"{n}_{a}{b}" for n in "JDS"
                       for a in "EI" for b in "EI"]

    def write_csv(j_tail, n_rows=30, tail_rows=12):
        rows = [",".join(cols)]
        for s in range(n_rows):
            j = 0.08 if s < n_rows - tail_rows else j_tail
            rows.append(",".join([str(s * 100)] + [str(j)] * 4
                                 + ["0.1"] * 8))
        (d / "generator.csv").write_text("\n".join(rows) + "\n")

    args = [str(d), "--window", "1000", "--min-step", "1000"]
    # J holds at truth across the window (last 12 rows = 1100 steps at
    # cadence 100 > the 1000-step window) -> cleared (D always at truth)
    write_csv(0.05)
    assert recovery_gate.main(args) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["cleared"] and max(out["j_err"]) <= 1e-12
    # J 60% off across the window -> not cleared
    write_csv(0.08)
    assert recovery_gate.main(args) == 1
    # window is steps, not rows: truth held for only 6 rows = 500 steps
    # of the 1000-step window -> the window must reach back into the bad
    # region and fail (a rows-based window of 1000 would also fail here,
    # but a rows-based window of 10 — the old unit — would pass)
    write_csv(0.05, tail_rows=6)
    assert recovery_gate.main([str(d), "--window", "1000",
                               "--min-step", "100"]) == 1
    assert recovery_gate.main([str(d), "--window", "400",
                               "--min-step", "100"]) == 0
    # window reaching before min-step -> not cleared even at truth
    write_csv(0.05)
    assert recovery_gate.main([str(d), "--window", "1000",
                               "--min-step", "999999"]) == 1
    # run shorter than the window -> not cleared
    write_csv(0.05, n_rows=5)
    assert recovery_gate.main(args) == 1
    # cadence that does NOT divide the window (regression: a left-side
    # searchsorted landed one row inside the window when no row's step
    # equals steps[-1]-window, failing 'trajectory too short' forever):
    # rows 300 steps apart, truth over the whole run, window 1000
    rows = [",".join(cols)] + [
        ",".join([str(s * 300)] + ["0.05"] * 4 + ["0.1"] * 8)
        for s in range(30)]
    (d / "generator.csv").write_text("\n".join(rows) + "\n")
    assert recovery_gate.main(args) == 0
    # truth override beats info.json: truth J=0.08 makes the 0.08 tail pass
    write_csv(0.08)
    assert recovery_gate.main(args + ["--true-J", "0.08", "0.08",
                                      "0.08", "0.08"]) == 0
    # a config that never recorded its truth must exit 2, not silently
    # gate against library defaults (ADVICE r3 #3)
    (d / "info.json").write_text(json.dumps({"config": {"dataset": None}}))
    capsys.readouterr()
    assert recovery_gate.main(args) == 2
    # ... but explicit flags still work on such a run
    assert recovery_gate.main(args + ["--true-J", "0.08", "0.08", "0.08",
                                      "0.08", "--true-D", "0.1", "0.1",
                                      "0.1", "0.1"]) == 0


def test_ensemble_view_handles_mm_columns(tmp_path):
    """ensemble_view must render moment-matching ensembles (loss/mean_err
    columns), not just the WGAN column set (was: KeyError 'd_loss')."""
    import csv as csv_mod

    from tcgan_tpu.analysis import ensemble_view
    from tcgan_tpu.analysis.loaders import load_ensemble

    cols = (["step", "member", "loss", "mean_err", "cov_err",
             "rate_penalty", "frac_converged", "frac_diverged", "train_time"]
            + [f"{blk}_{a}{b}" for blk in ("J", "D", "S")
               for a in "EI" for b in "EI"])
    with open(tmp_path / "ensemble.csv", "w", newline="") as f:
        w = csv_mod.writer(f)
        w.writerow(cols)
        for m in range(2):
            for step in (0, 1, 2):
                w.writerow([step, m, 1.0 / (step + 1), 0.1, 0.2, 0.0,
                            1.0, 0.0, 0.01] + [0.05] * 12)
    rec = load_ensemble(tmp_path)
    summary = ensemble_view.plot_ensemble(rec, str(tmp_path / "e.png"))
    assert summary["n_members"] == 2
    assert (tmp_path / "e.png").exists()
