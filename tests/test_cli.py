"""CLI layer tests: parser schemas, config construction, and a tiny
end-to-end run per entry point (CPU, tiny shapes).

Reference test analog: the per-entry smoke tier (SURVEY.md §4)."""

import json

import numpy as np
import pytest

from tcgan_tpu.run import (
    bptt_cwgan,
    bptt_wgan,
    common,
    eval as eval_cli,
    forward,
    gan,
    moments,
)

TINY_BASE = [
    "--N", "6", "--max-iter", "1500", "--atol", "1e-5",
    "--J", "0.02", "0.016", "0.02", "0.012",
    "--D", "0.05", "0.04", "0.05", "0.04",
    "--S", "0.25", "0.1", "0.25", "0.1",
    "--contrasts", "5", "--bandwidths", "0.25", "1.0",
]
TINY = TINY_BASE + ["--batch-size", "3"]
TINY_GAN = TINY + [
    "--n-steps", "2", "--WGAN_n_critic", "2", "--WGAN_n_critic0", "2",
    "--truth-samples", "8", "--disc-layers", "8",
]


def test_parsers_build_configs():
    for mod in (forward, gan, bptt_wgan, bptt_cwgan, moments, eval_cli):
        p = mod.make_parser()
        assert p is not None
        # argparse %-expands help strings at print time; an unescaped '%'
        # makes --help raise (regression: the --reject-unconverged help)
        assert p.format_help()
    args = gan.make_parser().parse_args(
        TINY_GAN + ["--datastore", "/tmp/x"])
    cfg = common.generator_config_from_args(args, solver="ift")
    assert cfg.ssn.N == 6
    assert cfg.n_stim == 2
    scfg = common.ssn_config_from_args(args)
    assert scfg.max_iter == 1500 and scfg.io_type == "asym_power"


def test_forward_cli_end_to_end(tmp_path):
    rc = forward.main(TINY + ["--datastore", str(tmp_path / "fwd")])
    assert rc == 0
    data = np.load(tmp_path / "fwd" / "tuning_curves.npz")
    assert data["tuning_curves"].shape[0] == 3
    assert data["converged"].all()
    info = json.loads((tmp_path / "fwd" / "info.json").read_text())
    assert info["status"] == "finished"


def test_forward_cli_serving_mode(tmp_path):
    """--total-samples loops jitted batches (rounded up to a batch
    multiple) and --parallel mesh shards them; throughput is reported."""
    rc = forward.main(TINY + [
        "--datastore", str(tmp_path / "fwd"), "--batch-size", "8",
        "--total-samples", "20", "--parallel", "mesh",
    ])
    assert rc == 0
    data = np.load(tmp_path / "fwd" / "tuning_curves.npz")
    assert data["tuning_curves"].shape[0] == 24  # ceil(20/8) batches
    assert data["converged"].shape[0] == 24
    info = json.loads((tmp_path / "fwd" / "info.json").read_text())
    summary = info["summary"]
    assert summary["n_devices"] == 8
    assert summary["stim_solves_per_sec"] > 0


def test_gan_cli_end_to_end(tmp_path):
    rc = gan.main(TINY_GAN + ["--datastore", str(tmp_path / "g")])
    assert rc == 0
    lines = (tmp_path / "g" / "learning.csv").read_text().strip().split("\n")
    assert len(lines) == 3
    # the periodic mean-TC stream must actually record (step 0 qualifies)
    tc_rows = (tmp_path / "g" / "tc_mean.jsonl").read_text().strip()
    assert tc_rows, "tc_mean.jsonl empty — periodic TC snapshots lost"
    assert len(json.loads(tc_rows.split("\n")[0])["tc_mean"]) == 2
    # generator.csv starts from the passed --J
    gen_first = (tmp_path / "g" / "generator.csv").read_text().split("\n")[1]
    assert abs(float(gen_first.split(",")[1]) - 0.02) < 1e-3


@pytest.mark.slowtest
def test_gan_cli_normalize_input_and_resume(tmp_path):
    d = str(tmp_path / "gn")
    rc = gan.main(TINY_GAN + ["--datastore", d, "--normalize-input",
                              "--checkpoint-every", "2"])
    assert rc == 0
    rc = gan.main(TINY_GAN + ["--datastore", d, "--normalize-input",
                              "--resume"])
    assert rc == 0
    steps = [l.split(",")[0] for l in
             open(f"{d}/learning.csv").read().strip().split("\n")[1:]]
    assert steps == ["0", "1", "2", "3"]


def test_gan_cli_moment_anchor_and_resume(tmp_path):
    # Hybrid objective end-to-end: anchor buffers live in TrainState, so
    # the checkpoint round-trip must carry them through --resume.
    d = str(tmp_path / "ga")
    rc = gan.main(TINY_GAN + ["--datastore", d, "--moment-anchor", "1e-3",
                              "--anchor-ema", "0.9",
                              "--checkpoint-every", "2"])
    assert rc == 0
    rc = gan.main(TINY_GAN + ["--datastore", d, "--moment-anchor", "1e-3",
                              "--anchor-ema", "0.9", "--resume"])
    assert rc == 0
    steps = [l.split(",")[0] for l in
             open(f"{d}/learning.csv").read().strip().split("\n")[1:]]
    assert steps == ["0", "1", "2", "3"]


def test_gan_cli_normalize_input_std_mode(tmp_path):
    # --normalize-input-mode std: per-feature 1/std whitening with the
    # 5%-of-mean-|TC| degeneracy floor (the scale the ridge-discrimination
    # probes separate under). Smoke both the plain and conditional paths.
    rc = gan.main(TINY_GAN + [
        "--datastore", str(tmp_path / "gs"), "--normalize-input",
        "--normalize-input-mode", "std"])
    assert rc == 0
    rc = bptt_cwgan.main(TINY_GAN + [
        "--datastore", str(tmp_path / "gsc"), "--solver", "ift",
        "--normalize-input", "--normalize-input-mode", "std"])
    assert rc == 0


def test_moments_cli_end_to_end(tmp_path):
    rc = moments.main(TINY + [
        "--datastore", str(tmp_path / "m"), "--n-steps", "2",
        "--truth-samples", "8", "--batch-size", "4"])
    assert rc == 0
    lines = (tmp_path / "m" / "learning.csv").read_text().strip().split("\n")
    assert lines[0].startswith("step,loss,mean_err")
    assert len(lines) == 3


def test_cwgan_cli_end_to_end(tmp_path):
    rc = bptt_cwgan.main(TINY_GAN + ["--datastore", str(tmp_path / "c"),
                                     "--solver", "ift"])
    assert rc == 0
    assert (tmp_path / "c" / "learning.csv").exists()


def test_eval_cli_end_to_end(tmp_path):
    import contextlib
    import io

    d = str(tmp_path / "g2")
    gan.main(TINY_GAN + ["--datastore", d])
    buf = io.StringIO()
    ev = str(tmp_path / "g2_eval")
    with contextlib.redirect_stdout(buf):
        rc = eval_cli.main(TINY_BASE + [
            "--run", d, "--eval-samples", "8", "--truth-samples", "8",
            "--datastore", ev,
            "--true-J", "0.02", "0.016", "0.02", "0.012",
            "--true-D", "0.05", "0.04", "0.05", "0.04",
            "--true-S", "0.25", "0.1", "0.25", "0.1"])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().split("\n")[-1])
    assert np.isfinite(out["tc_w1"])
    assert "param_recovery_error" in out
    # eval artifacts: TC comparison + per-condition marginal grid
    assert (tmp_path / "g2_eval" / "tc_comparison.png").exists()
    assert (tmp_path / "g2_eval" / "tc_grid.png").exists()
    assert len(out["per_condition_w1"]) == 2  # 2 stimulus conditions


def test_learning_curves_analyzer(tmp_path):
    from tcgan_tpu.analysis import learning_curves

    d = str(tmp_path / "g3")
    gan.main(TINY_GAN + ["--datastore", d])
    rc = learning_curves.main([d, "--true-J", "0.02", "0.016", "0.02", "0.012"])
    assert rc == 0
    assert (tmp_path / "g3" / "learning_curves.png").stat().st_size > 10000


def test_bptt_wgan_cli_end_to_end(tmp_path):
    """C3 smoke: BPTT gradients through the unrolled scan, with remat
    chunks, end-to-end through the CLI (VERDICT r1 missing item #4)."""
    rc = bptt_wgan.main(TINY_GAN + [
        "--datastore", str(tmp_path / "b"), "--dt", "0.001",
        "--seqlen", "600", "--bptt-checkpoint-chunk", "200",
    ])
    assert rc == 0
    lines = (tmp_path / "b" / "learning.csv").read_text().strip().split("\n")
    assert len(lines) == 3
    row = dict(zip(lines[0].split(","), lines[-1].split(",")))
    assert np.isfinite(float(row["d_loss"]))
    assert np.isfinite(float(row["g_loss"]))
    assert float(row["frac_converged"]) > 0.9


def test_cli_reference_docs_fresh():
    """docs/cli_reference.md is generated from the live parsers; a flag
    change without `make docs` fails here instead of silently drifting."""
    from pathlib import Path

    from tcgan_tpu.utils import cli_docs

    path = Path(__file__).resolve().parents[1] / "docs" / "cli_reference.md"
    assert path.read_text() == cli_docs.render(), (
        "docs/cli_reference.md is stale — run `make docs`")


def test_eval_reads_run_config(tmp_path):
    """apply_run_config overlays info.json values; explicit flags win and
    are reported as overrides."""
    import argparse

    run = tmp_path / "run"
    run.mkdir()
    (run / "info.json").write_text(json.dumps({"config": {
        "N": 17, "contrasts": [5.0, 10.0, 13.0], "sample_sites": 4,
        "include_inhibitory_neurons": True, "true_J": [1, 2, 3, 4],
    }}))
    p = argparse.ArgumentParser()
    common.add_ssn_flags(p)
    common.add_stimulus_flags(p)
    common.add_data_flags(p)
    argv = ["--sample-sites", "2"]
    args = p.parse_args(argv)
    notices = common.apply_run_config(args, p, argv, run)
    assert args.N == 17
    assert args.contrasts == [5.0, 10.0, 13.0]
    assert args.include_inhibitory_neurons is True
    assert args.true_J == [1, 2, 3, 4]
    assert args.sample_sites == 2  # explicit flag wins ...
    assert len(notices) == 1 and "sample-sites" in notices[0]  # ... loudly


def test_normalize_input_mode_implies_normalization():
    """An explicit --normalize-input-mode must imply --normalize-input:
    passing a mode without the switch silently ran UNNORMALIZED before
    round 3 (the footgun that nearly shipped an unwhitened flagship run).
    Checked at the parser level (default None = not explicit) and at the
    scale-computation level in gan_common/ensemble."""
    from types import SimpleNamespace

    from tcgan_tpu.run.gan_common import make_gan_parser
    from tests.test_wgan import small_gen_cfg

    p = make_gan_parser("x")
    base = ("--datastore /tmp/x --N 8 --batch-size 4 "
            "--J .045 .04 .05 .035 --D .1 .08 .1 .08 "
            "--S .25 .1 .25 .1").split()
    a_mode = p.parse_args(base + ["--normalize-input-mode", "std"])
    a_none = p.parse_args(base)
    assert a_mode.normalize_input_mode == "std"
    assert a_none.normalize_input_mode is None  # default stays non-explicit
    # exercise the PRODUCTION implication (common.critic_input_scales is
    # the single place gan_common and run.ensemble route through)
    gen = small_gen_cfg()
    ds = SimpleNamespace(tc=np.random.RandomState(0).rand(
        16, gen.n_stim * gen.n_probe) + 0.5, num_samples=16)
    scale, _ = common.critic_input_scales(a_mode, gen, ds, False)
    assert a_mode.normalize_input is True and scale is not None
    scale, _ = common.critic_input_scales(a_none, gen, ds, False)
    assert a_none.normalize_input is False and scale is None


def test_explicit_dests_matches_argparse_abbreviations():
    """argparse allows unambiguous prefix abbreviations (--bandwidth for
    --bandwidths), so explicit_dests must mark those dests explicit too —
    otherwise eval's apply_run_config silently overwrites the user's typed
    value with the run's recorded config. Ambiguous prefixes (--contrast
    matches both --contrasts and --contrast-weights) are rejected by
    argparse itself, so explicit_dests marks nothing for them."""
    from tcgan_tpu.run.gan_common import make_gan_parser

    p = make_gan_parser("x")
    dests = common.explicit_dests(
        p, ["--bandwidth", "0.25", "1.0", "--normalize-input"])
    assert "bandwidths" in dests  # abbreviation resolved
    assert "normalize_input" in dests  # exact match still works
    assert "contrasts" not in dests
    # ambiguous prefix: argparse would error; mark nothing rather than guess
    dests = common.explicit_dests(p, ["--contrast", "5", "10"])
    assert "contrasts" not in dests and "contrast_weights" not in dests
    # '=' form
    dests = common.explicit_dests(p, ["--batch-size=8"])
    assert "batch_size" in dests


def test_critic_input_scales_shared_helper():
    """The scale helper shared by gan_common and run.ensemble: an explicit
    mode implies normalization, per-condition scaling requires a
    conditional run (SystemExit otherwise), and the conditional
    per-condition path returns S*P + 2 scales (probe block + tag)."""
    from types import SimpleNamespace

    from tests.test_wgan import small_gen_cfg

    gen = small_gen_cfg()
    S, P = gen.n_stim, gen.n_probe
    rng = np.random.RandomState(0)
    ds = SimpleNamespace(tc=rng.rand(32, S * P) + 0.5, num_samples=32)

    args = SimpleNamespace(normalize_input=False, normalize_input_mode="std",
                           normalize_per_condition=None)
    scale, cond_scale = common.critic_input_scales(args, gen, ds, False)
    assert args.normalize_input is True  # mode implies the switch
    assert scale is not None and len(scale) == S * P
    assert cond_scale is None

    args = SimpleNamespace(normalize_input=False, normalize_input_mode=None,
                           normalize_per_condition="std")
    with pytest.raises(SystemExit):
        common.critic_input_scales(args, gen, ds, False)  # unconditional

    scale, cond_scale = common.critic_input_scales(args, gen, ds, True)
    assert scale is None
    assert cond_scale is not None and len(cond_scale) == S * P + 2


def test_real_data_path_end_to_end(tmp_path):
    """The reference's reason to exist: fit MEASURED tuning curves from a
    file (SURVEY.md §2 "Data loading / truth generation"). Chain: a .npz
    dataset -> train `run.gan --dataset` -> `run.eval` WITHOUT truth
    (W1-family metrics only, no recovery errors) -> markdown report that
    degrades gracefully with no true_J/true_D. Every fit before round 4
    was fake-truth; a schema mismatch or an eval-without-truth crash in
    this path would otherwise surface only the day someone brings real
    data (VERDICT r3 missing #4)."""
    from tcgan_tpu.analysis import report

    # (a) "measured" tuning curves: a forward sweep saved to .npz — the
    # same file format a user would convert their recordings into
    data_dir = tmp_path / "data"
    rc = forward.main(TINY + ["--datastore", str(data_dir),
                              "--batch-size", "32"])
    assert rc == 0
    dataset = data_dir / "tuning_curves.npz"

    # (b) train from the file: no --true-* flags anywhere
    run_dir = tmp_path / "fit"
    rc = gan.main(TINY_GAN + ["--datastore", str(run_dir),
                              "--dataset", str(dataset)])
    assert rc == 0
    assert (run_dir / "learning.csv").read_text().count("\n") >= 2
    info = json.loads((run_dir / "info.json").read_text())
    assert info["config"]["dataset"] == str(dataset)

    # (c) eval against the same file, truth unknown: W1 metrics come back,
    # recovery errors must be absent rather than wrong
    eval_dir = tmp_path / "fit_eval"
    rc = eval_cli.main(["--run", str(run_dir), "--dataset", str(dataset),
                        "--datastore", str(eval_dir),
                        "--eval-samples", "16"])
    assert rc == 0
    res = json.loads((eval_dir / "info.json").read_text())["result"]
    assert np.isfinite(res["tc_w1"]) and np.isfinite(res["sliced_w1"])
    assert "param_recovery_error" not in res
    assert (eval_dir / "eval_tuning_curves.npz").exists()

    # (d) report renders without truth: no recovery table, no crash
    out_md = tmp_path / "fit.md"
    assert report.main([str(run_dir), "-o", str(out_md)]) == 0
    text = out_md.read_text()
    assert "recovery" not in text.lower() or "no ground truth" in text.lower()
