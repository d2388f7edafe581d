"""Recorder/datastore/loader tests (reference analog: CSV-schema and
info.json coverage, SURVEY.md §4 "Recorder/datastore tests")."""

import json

import numpy as np

from tcgan_tpu.analysis import load_run
from tcgan_tpu.analysis.metrics import (
    param_recovery_error,
    sliced_w1,
    tc_w1,
)
from tcgan_tpu.train.datastore import DataStore, KnownError
from tcgan_tpu.train.recorders import (
    GEN_COLUMNS,
    LEARNING_COLUMNS,
    CSVRecorder,
    RecorderSet,
    flatten_gen_params,
)


def test_datastore_info_json(tmp_path):
    store = DataStore(tmp_path / "run")
    store.write_info({"a": 1, "nested": {"b": [1, 2]}})
    store.finalize("finished", {"extra": "x"})
    info = json.loads((tmp_path / "run" / "info.json").read_text())
    assert info["config"]["a"] == 1
    assert info["status"] == "finished"
    assert "git_revision" in info and "library_versions" in info
    assert info["elapsed_seconds"] >= 0


def test_csv_recorder_schema_and_append(tmp_path):
    path = tmp_path / "x.csv"
    r = CSVRecorder(path, ["step", "loss"])
    r.record({"step": 0, "loss": 1.5})
    r.record({"loss": 2.5, "step": 1, "ignored": 9})
    r.close()
    lines = path.read_text().strip().split("\n")
    assert lines[0] == "step,loss"
    assert lines[1] == "0,1.5"
    # append mode: header not rewritten on reopen
    r2 = CSVRecorder(path, ["step", "loss"])
    r2.record({"step": 2, "loss": 3.0})
    r2.close()
    assert path.read_text().strip().split("\n")[0] == "step,loss"
    assert len(path.read_text().strip().split("\n")) == 4


def test_recorder_set_and_loader_roundtrip(tmp_path):
    store = DataStore(tmp_path / "run")
    store.write_info({"entry": "test"})
    rs = RecorderSet(store, critic_param_names=["w0", "b0"])
    row = {c: float(i) for i, c in enumerate(LEARNING_COLUMNS)}
    rs.record_learning(row)
    J = np.array([[1.0, 2.0], [3.0, 4.0]])
    rs.record_generator(0, (J, J * 10, J * 100))
    rs.record_disc_stats(0, {"w0.nnorm": 1.0, "w0.absmax": 2.0,
                             "b0.nnorm": 0.5, "b0.absmax": 0.7})
    rs.record_tc_mean(0, np.arange(4.0))
    rs.close()
    store.finalize()

    rec = load_run(tmp_path / "run")
    assert list(rec.learning.keys()) == LEARNING_COLUMNS
    traj = rec.gen_param_trajectory("J")
    np.testing.assert_allclose(traj[0], J)
    np.testing.assert_allclose(rec.gen_param_trajectory("S")[0], J * 100)
    assert rec.tc_mean[0]["tc_mean"] == [0.0, 1.0, 2.0, 3.0]
    assert rec.info["status"] == "finished"


def test_flatten_gen_params_naming():
    J = np.array([[1, 2], [3, 4]], dtype=float)
    flat = flatten_gen_params((J, J, J))
    assert flat["J_EE"] == 1 and flat["J_EI"] == 2
    assert flat["J_IE"] == 3 and flat["J_II"] == 4
    assert set(GEN_COLUMNS[1:]) == set(flat.keys())


def test_metrics():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 4))
    b = rng.normal(size=(400, 4))
    assert tc_w1(a, a) < 1e-9
    assert tc_w1(a, b) < 0.2  # same distribution, finite-sample
    shifted = a + 1.0
    assert tc_w1(a, shifted) > 0.8
    assert sliced_w1(a, shifted) > 0.2
    err = param_recovery_error({"J": np.eye(2)}, {"J": np.eye(2) * 2})
    assert 0.4 < err["J"] < 0.6


def test_recorder_truncate_from(tmp_path):
    """Resume support: rows at/after the restored step are dropped from
    CSV and JSONL streams instead of being double-recorded."""
    from tcgan_tpu.train.recorders import CSVRecorder, JSONLRecorder

    c = CSVRecorder(tmp_path / "x.csv", ["step", "v"])
    j = JSONLRecorder(tmp_path / "x.jsonl")
    for s in range(6):
        c.record({"step": s, "v": s * 10})
        j.record({"step": s, "v": s * 10})
    c.truncate_from(3)
    j.truncate_from(3)
    c.record({"step": 3, "v": 999})  # the resumed step's fresh row
    c.close(), j.close()
    import csv as csv_mod
    rows = list(csv_mod.reader(open(tmp_path / "x.csv")))[1:]
    assert [int(float(r[0])) for r in rows] == [0, 1, 2, 3]
    assert rows[-1][1] == "999"
    steps = [json.loads(l)["step"] for l in open(tmp_path / "x.jsonl")]
    assert steps == [0, 1, 2]


def test_dedup_datastore_keep_last(tmp_path):
    """Post-incident repair tool (docs/artifacts/dedup_datastore.py):
    dual-writer interleaved rows collapse to the LAST occurrence per
    step, preserving single-writer rows untouched."""
    import subprocess
    import sys

    run = tmp_path / "run"
    run.mkdir()
    # interleaved lineages: A writes 1,2,3; B (later, the survivor)
    # writes 2,3,4 — keep-last must keep A's 1 and B's 2,3,4
    # a1..b4 are float-parseable values (the tool drops rows whose
    # fields don't parse); 2,9 vs 2,90 etc distinguish lineages. Torn
    # fragments (wrong column count / unparseable step) must be dropped
    # even when they'd win keep-last.
    (run / "generator.csv").write_text(
        "step,v,w\n1,10,0\n2,20,0\n2,21,0\n3,30,0\n3,31,0\n"
        "4,40,0\n4,41\n5,5e\n")
    (run / "learning.jsonl").write_text(
        '{"step": 1, "v": "a"}\n{"step": 1, "v": "b"}\n'
        '{"step": 2, "v": "b"}\n{"step": 3, "v": "TORN{"ste\n'
        '{"note": "meta1"}\n{"note": "meta2"}\n')
    r = subprocess.run(
        [sys.executable, "docs/artifacts/dedup_datastore.py", str(run),
         "--pidfile", str(tmp_path / "nonexistent.pid")],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert (run / "generator.csv").read_text() == (
        "step,v,w\n1,10,0\n2,21,0\n3,31,0\n4,40,0\n")
    lines = (run / "learning.jsonl").read_text().splitlines()
    # keep-last per step; torn line dropped; BOTH step-less records kept
    parsed = [json.loads(l) for l in lines]
    assert [p.get("v", p.get("note")) for p in parsed] == [
        "b", "b", "meta1", "meta2"]
    # refusal path: a live pidfile (this test's own pid) blocks the tool
    import os
    live = tmp_path / "live.pid"
    live.write_text(str(os.getpid()))
    r2 = subprocess.run(
        [sys.executable, "docs/artifacts/dedup_datastore.py", str(run),
         "--pidfile", str(live)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode != 0 and "refusing" in r2.stderr
