"""Round-3 feature tests: per-condition critic normalization, condition
weights, split critic lr schedule, per-circuit survivor mask (cwgan),
adaptive solver budget, and eval-reads-run-config helpers."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.models import cwgan as cwgan_lib
from tcgan_tpu.models import wgan as wgan_lib
from tcgan_tpu.models.cwgan import CWGANConfig
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig


def _gen_cfg(**kw):
    base = dict(
        ssn=SSNConfig(N=6, seqlen=100, max_iter=200, atol=1e-4),
        bandwidths=(0.0, 1.0), contrasts=(5.0, 10.0),
        sample_sites=2, track_offset_identity=True,
        include_inhibitory_neurons=False, solver="ift",
    )
    base.update(kw)
    return GeneratorConfig(**base)


def test_cond_input_scale_applied_at_tagging():
    gen = _gen_cfg()
    S, P = gen.n_stim, gen.n_probe
    scale = np.arange(1, S * P + 3, dtype=np.float32)  # S*P + 2 tag scales
    cfg = CWGANConfig(gen=gen, cond_input_scale=tuple(float(x) for x in scale))
    B = 3
    tc = jnp.ones((B, S, P), jnp.float32)
    tagged = cwgan_lib.tag_with_conditions(cfg, tc)
    assert tagged.shape == (B * S, P + 2)
    # probe block of (circuit 0, condition s) must equal scale[s*P:(s+1)*P]
    got = np.asarray(tagged)[:S, :P]
    want = scale[: S * P].reshape(S, P)
    np.testing.assert_allclose(got, want)
    # tag features scaled by the trailing two entries
    feats = np.asarray(gen.condition_features())
    np.testing.assert_allclose(np.asarray(tagged)[:S, P:],
                               feats * scale[S * P:], rtol=1e-6)
    # the critic's own static input_scale must be disabled (no double scale)
    assert cfg.critic_cfg.input_scale is None


def test_cond_row_weights_layout():
    gen = _gen_cfg()
    S = gen.n_stim
    w = tuple(float(i + 1) for i in range(S))
    cfg = CWGANConfig(gen=gen, cond_weight=w)
    rows = cwgan_lib.cond_row_weights(cfg, 2 * S)
    # condition-major rows: circuit 0's S conditions then circuit 1's
    np.testing.assert_allclose(np.asarray(rows), np.tile(w, 2))
    assert cwgan_lib.cond_row_weights(CWGANConfig(gen=gen), 2 * S) is None


def test_cwgan_fake_row_weights_per_circuit():
    """Rejection must mask ALL rows of a circuit with any failed condition
    (the dataset's survivor selection), not just the failed solve's row."""
    gen = _gen_cfg()
    S = gen.n_stim
    cfg = CWGANConfig(gen=gen, reject_unconverged=True)

    class Out:
        converged = jnp.array([[True] * S, [True] + [False] * (S - 1)])

    w = np.asarray(cwgan_lib.fake_row_weights(cfg, Out()))
    assert w.shape == (2 * S,)
    np.testing.assert_allclose(w[:S], 1.0)  # fully-converged circuit kept
    np.testing.assert_allclose(w[S:], 0.0)  # partially-diverged: ALL rows out


def test_critic_lr_decay_split():
    import optax

    cfg = wgan_lib.WGANConfig(lr_gen=1e-3, lr_critic=1e-3,
                              lr_decay_steps=10, lr_decay_rate=0.5,
                              critic_lr_decay_steps=0)
    gen_tx, critic_tx = wgan_lib.make_optimizers(cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}

    def nth_update(tx, n):
        st = tx.init(params)
        for _ in range(n):
            up, st = tx.update(grads, st, params)
        return float(np.abs(np.asarray(up["w"])).mean())

    # after 30 steps the generator lr decayed 8x; the critic lr did not —
    # Adam normalizes magnitudes, so compare the decayed scale directly
    g30, c30 = nth_update(gen_tx, 30), nth_update(critic_tx, 30)
    assert c30 > 4 * g30, (g30, c30)
    # follow-mode (-1): both decay identically
    cfg2 = dataclasses.replace(cfg, critic_lr_decay_steps=-1)
    _, critic_tx2 = wgan_lib.make_optimizers(cfg2)
    c30b = nth_update(critic_tx2, 30)
    assert abs(c30b - g30) / g30 < 1e-5


def test_moments_survivor_mask_flag():
    from tcgan_tpu.models import moments as mm_lib

    gen = _gen_cfg()
    cfg_on = mm_lib.MomentMatchingConfig(gen=gen, batch_size=4)
    cfg_off = dataclasses.replace(cfg_on, survivor_mask=False)
    assert cfg_on.survivor_mask and not cfg_off.survivor_mask

    class Out:
        converged = jnp.array([[True, True, True, True],
                               [True, False, True, True],
                               [True, True, True, True],
                               [False, False, False, False]])

    m = np.asarray(mm_lib.sample_mask(cfg_on, Out()))
    np.testing.assert_allclose(m, [1.0, 0.0, 1.0, 0.0])


def test_adaptive_solver_budget_bucketing():
    from tcgan_tpu.train.datastore import DataStore
    from tcgan_tpu.train.driver import DriverConfig, GANDriver

    gen = _gen_cfg(ssn=SSNConfig(N=6, max_iter=8192))
    cfg = wgan_lib.WGANConfig(gen=gen, batch_size=4)
    state = wgan_lib.init_state(cfg)

    class M:
        def __init__(self, fconv, miters):
            self.frac_converged = fconv
            self.mean_iters = miters

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        store = DataStore(d)
        drv = GANDriver(cfg, DriverConfig(adaptive_max_iter=True,
                                          adaptive_margin=4.0),
                        store, lambda *a: None, state,
                        lambda *a: None)
        # healthy steps at ~400 iters -> cap 4*400=1600 -> bucket 2048
        for s in range(5):
            drv._adapt_solver_budget(s, M(1.0, 400.0))
        assert drv.model_cfg.gen.ssn.max_iter == 2048
        # a divergence outbreak must NOT raise the budget (EMA frozen)
        drv._adapt_solver_budget(6, M(0.3, 2048.0))
        assert drv.model_cfg.gen.ssn.max_iter == 2048
        # floor: very fast convergence still keeps >= 1024
        drv2 = GANDriver(cfg, DriverConfig(adaptive_max_iter=True),
                         store, lambda *a: None, state, lambda *a: None)
        drv2._adapt_solver_budget(0, M(1.0, 50.0))
        assert drv2.model_cfg.gen.ssn.max_iter == 1024
        # ceiling: never exceeds the configured max_iter
        drv3 = GANDriver(cfg, DriverConfig(adaptive_max_iter=True,
                                           adaptive_margin=100.0),
                         store, lambda *a: None, state, lambda *a: None)
        drv3._adapt_solver_budget(0, M(1.0, 5000.0))
        assert drv3.model_cfg.gen.ssn.max_iter == 8192


def test_eval_reads_run_config(tmp_path):
    """apply_run_config overlays info.json values; explicit flags win and
    are reported as overrides."""
    import argparse
    import json

    from tcgan_tpu.run import common

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


def test_cwgan_critic_loss_cond_weighting():
    """With all weight on condition 0, the critic loss must ignore other
    conditions' scores entirely."""
    gen = _gen_cfg()
    S = gen.n_stim
    w = (float(S),) + (0.0,) * (S - 1)  # mean 1, all mass on condition 0
    cfg = CWGANConfig(gen=gen, cond_weight=w, gp_lambda=0.0,
                      critic_layers=(8,), batch_size=2)
    key = jax.random.PRNGKey(0)
    params = __import__("tcgan_tpu.models.critic", fromlist=["x"]).init_params(
        cfg.critic_cfg, key)
    B = 2
    real = jax.random.normal(key, (B * S, gen.n_probe + 2))
    fake = jax.random.normal(jax.random.fold_in(key, 1), (B * S, gen.n_probe + 2))
    loss1, _ = cwgan_lib.critic_loss_fn(cfg, params, real, fake, key)
    # perturb a non-condition-0 row hugely: loss must not change
    fake2 = fake.at[1].set(fake[1] + 100.0)
    real2 = real.at[2].set(real[2] - 50.0)
    loss2, _ = cwgan_lib.critic_loss_fn(cfg, params, real2, fake2, key)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_normalize_input_mode_implies_normalization():
    """An explicit --normalize-input-mode must imply --normalize-input:
    passing a mode without the switch silently ran UNNORMALIZED before
    round 3 (the footgun that nearly shipped an unwhitened flagship run).
    Checked at the parser level (default None = not explicit) and at the
    scale-computation level in gan_common/ensemble."""
    from tcgan_tpu.run.gan_common import make_gan_parser

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
    from types import SimpleNamespace

    from tcgan_tpu.run import common as run_common

    gen = _gen_cfg()
    ds = SimpleNamespace(tc=np.random.RandomState(0).rand(
        16, gen.n_stim * gen.n_probe) + 0.5, num_samples=16)
    scale, _ = run_common.critic_input_scales(a_mode, gen, ds, False)
    assert a_mode.normalize_input is True and scale is not None
    scale, _ = run_common.critic_input_scales(a_none, gen, ds, False)
    assert a_none.normalize_input is False and scale is None


def test_explicit_dests_matches_argparse_abbreviations():
    """argparse allows unambiguous prefix abbreviations (--bandwidth for
    --bandwidths), so explicit_dests must mark those dests explicit too —
    otherwise eval's apply_run_config silently overwrites the user's typed
    value with the run's recorded config. Ambiguous prefixes (--contrast
    matches both --contrasts and --contrast-weights) are rejected by
    argparse itself, so explicit_dests marks nothing for them."""
    from tcgan_tpu.run import common
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

    from tcgan_tpu.run import common

    gen = _gen_cfg()
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


def test_anchor_loss_zero_survivor_holds_ema():
    """A batch where not even one solve converged must NOT blend its
    all-zero 'moments' into the anchor EMA (it is not an estimate); the
    EMA holds and resumes blending when survivors return."""
    from types import SimpleNamespace

    from tcgan_tpu.models.moments import data_moments

    cfg = wgan_lib.WGANConfig(gen=_gen_cfg())
    B, S, F = 4, cfg.gen.n_stim, 6
    rng = np.random.RandomState(1)
    tc = jnp.asarray(rng.rand(B, F), jnp.float32)
    dm, dsec = data_moments(jnp.asarray(rng.rand(32, F), jnp.float32))
    em = jnp.full_like(dm, 0.5)
    esec = jnp.full_like(dsec, 0.25)
    state = SimpleNamespace(step=jnp.asarray(10, jnp.int32),
                            data_mean=dm, data_second=dsec,
                            mom_ema_mean=em, mom_ema_second=esec,
                            mom_ema_count=jnp.asarray(10.0, jnp.float32))

    out_dead = SimpleNamespace(tc=tc, converged=jnp.zeros((B, S), bool))
    _, em_d, esec_d, cnt_d = wgan_lib.anchor_loss(cfg, state, out_dead)
    np.testing.assert_allclose(np.asarray(em_d), np.asarray(em))
    np.testing.assert_allclose(np.asarray(esec_d), np.asarray(esec))
    assert float(cnt_d) == 10.0  # counter holds with the EMA

    out_ok = SimpleNamespace(tc=tc, converged=jnp.ones((B, S), bool))
    _, em_o, _, cnt_o = wgan_lib.anchor_loss(cfg, state, out_ok)
    assert not np.allclose(np.asarray(em_o), np.asarray(em))
    assert float(cnt_o) == 11.0


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


def test_data_moments_soft_weights_unbiased():
    """Soft survivor weights summing below 1 must not bias the weighted
    moments (the old n = max(sum(w), 1.0) clamp scaled them by sum(w))."""
    from tcgan_tpu.models.moments import data_moments

    rng = np.random.RandomState(0)
    tc = jnp.asarray(rng.rand(8, 5))
    m_full, s_full = data_moments(tc)
    m_soft, s_soft = data_moments(tc, 0.1 * jnp.ones(8))
    np.testing.assert_allclose(np.asarray(m_soft), np.asarray(m_full),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_soft), np.asarray(s_full),
                               rtol=1e-6)


def test_mm_sample_mask_absorbing_state_fallback():
    """The mm survivor mask falls back to soft per-circuit weights when NO
    circuit fully converged (all-zero weights would freeze a fixed_z
    objective permanently — the rec13anchor absorbing state, previously
    fixed only for the WGAN family)."""
    from types import SimpleNamespace

    from tcgan_tpu.models import moments as mm_lib

    cfg = mm_lib.MomentMatchingConfig(gen=_gen_cfg())
    S = cfg.gen.n_stim
    conv = jnp.zeros((3, S), bool).at[:, 0].set(True)  # no full survivor
    w = np.asarray(mm_lib.sample_mask(cfg, SimpleNamespace(converged=conv)))
    assert w.sum() > 0  # soft fallback active
    np.testing.assert_allclose(w, 1.0 / S)
    # strict semantics resume once any circuit fully converges
    conv2 = conv.at[1].set(True)
    w2 = np.asarray(mm_lib.sample_mask(cfg, SimpleNamespace(converged=conv2)))
    np.testing.assert_allclose(w2, [0.0, 1.0, 0.0])


def test_mm_ensemble_members_get_distinct_fixed_z_keys():
    """Under fixed_z every ensemble member must carry its OWN CRN z-set;
    a shared PRNGKey(seed) would turn the z-set's Monte-Carlo error into
    a common bias invisible to the member spread."""
    from tcgan_tpu.models import ensemble as ens_lib
    from tcgan_tpu.models import moments as mm_lib

    cfg = mm_lib.MomentMatchingConfig(gen=_gen_cfg(), batch_size=4,
                                      fixed_z=True)
    states = ens_lib.init_mm_ensemble(cfg, 4, jax.random.PRNGKey(0),
                                      start_jitter=0.05)
    zk = np.asarray(states.z_key)
    assert zk.shape[0] == 4
    assert len({tuple(row) for row in zk.reshape(4, -1)}) == 4


def test_ensemble_member0_ema_params_reset():
    """With start_jitter, member 0 keeps the exact requested start in its
    parameter-EMA buffer too (init seeds the EMA from the jittered
    params)."""
    from tcgan_tpu.models import ensemble as ens_lib

    cfg = wgan_lib.WGANConfig(gen=_gen_cfg(), batch_size=4,
                              critic_layers=(8,), ema_decay=0.99)
    base = jax.tree.map(jnp.asarray,
                        __import__("tcgan_tpu.models.generator",
                                   fromlist=["init_params"]).init_params(cfg.gen))
    states = ens_lib.init_ensemble(cfg, 3, jax.random.PRNGKey(1),
                                   gen_init=base, start_jitter=0.1)
    for leaf_s, leaf_b in zip(jax.tree.leaves(states.ema_params),
                              jax.tree.leaves(base)):
        np.testing.assert_allclose(np.asarray(leaf_s[0]), np.asarray(leaf_b))
        assert not np.allclose(np.asarray(leaf_s[1]), np.asarray(leaf_b))


def test_adaptive_budget_escape_valve_and_sidecar(tmp_path):
    """(1) Escape valve: when the cap itself keeps frac_converged < 0.9
    (an absorbing state — the EMA gate would never fire again), 50
    sustained unhealthy capped steps raise the EMA one bucket. (2) The
    adaptive state survives resume via the sidecar file (orbax holds
    model state only)."""
    from tcgan_tpu.train.datastore import DataStore
    from tcgan_tpu.train.driver import DriverConfig, GANDriver

    gen = _gen_cfg(ssn=SSNConfig(N=6, max_iter=8192))
    cfg = wgan_lib.WGANConfig(gen=gen, batch_size=4)
    state = wgan_lib.init_state(cfg)

    class M:
        def __init__(self, fconv, miters):
            self.frac_converged = fconv
            self.mean_iters = miters

    store = DataStore(tmp_path)
    dcfg = DriverConfig(adaptive_max_iter=True, adaptive_margin=4.0)
    drv = GANDriver(cfg, dcfg, store, lambda *a: None, state,
                    lambda *a: None)
    for s in range(5):
        drv._adapt_solver_budget(s, M(1.0, 400.0))
    assert drv.model_cfg.gen.ssn.max_iter == 2048
    # slow-but-convergent tail cut off by the cap: unhealthy while capped
    for s in range(49):
        drv._adapt_solver_budget(10 + s, M(0.85, 2048.0))
    assert drv.model_cfg.gen.ssn.max_iter == 2048  # not yet
    drv._adapt_solver_budget(60, M(0.85, 2048.0))  # 50th -> valve fires
    assert drv.model_cfg.gen.ssn.max_iter == 4096
    # a healthy step resets the streak and resumes normal EMA tracking
    drv._adapt_solver_budget(61, M(0.95, 500.0))
    assert drv._capped_unhealthy == 0

    # sidecar: persists at checkpoint time, restored by a fresh driver
    drv._save_adaptive_state()
    drv2 = GANDriver(cfg, dcfg, store, lambda *a: None, state,
                     lambda *a: None)
    assert drv2._iter_ema is not None
    assert drv2.model_cfg.gen.ssn.max_iter == drv.model_cfg.gen.ssn.max_iter


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
    import json as json_mod
    steps = [json_mod.loads(l)["step"] for l in open(tmp_path / "x.jsonl")]
    assert steps == [0, 1, 2]


def test_ensemble_flag_contradictions_error_loudly():
    """--estimator wgan + --conditional, --estimator mm + --conditional,
    mm + --parallel mesh, and --record-every 0 must all SystemExit instead
    of silently resolving to something the user did not ask for."""
    from tcgan_tpu.run import ensemble as ens_run

    base = ("--datastore /tmp/x --N 8 --batch-size 4 "
            "--J .045 .04 .05 .035 --D .1 .08 .1 .08 "
            "--S .25 .1 .25 .1").split()
    for extra in (["--estimator", "wgan", "--conditional"],
                  ["--estimator", "mm", "--conditional"],
                  ["--estimator", "mm", "--parallel", "mesh"],
                  ["--record-every", "0"]):
        with pytest.raises(SystemExit):
            ens_run.main(base + extra)


def test_mat_loader_requires_unambiguous_variable(tmp_path):
    scipy = pytest.importorskip("scipy.io")
    from tcgan_tpu.data.datasets import load_tuning_curves

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


def test_make_mesh_validates_divisibility():
    from tcgan_tpu import parallel as par

    devs = (jax.devices("cpu") * 8)[:8]  # exactly-8-entry device list
    with pytest.raises(ValueError):
        par.make_mesh(n_model=3, devices=devs)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        par.make_mesh(n_model=16, devices=devs)  # zero-device mesh
    with pytest.raises(ValueError):
        par.make_mesh(n_batch=16, devices=devs)  # more than available
