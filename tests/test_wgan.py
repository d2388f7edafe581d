"""WGAN/cWGAN/moment-matching smoke + semantics tests on tiny configs.

Reference test analog: the smoke/integration tier of SURVEY.md §4 — tiny
deterministic configs, fake-truth data generated on the fly, assert the
train step runs, shapes line up, and parameters actually move.

Kept deliberately small: this sandbox's per-dispatch overhead is large, so
each test does one or two fused jit calls.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.models import cwgan as cwgan_lib
from tcgan_tpu.models import generator as gen_lib
from tcgan_tpu.models import moments as mm_lib
from tcgan_tpu.models import wgan as wgan_lib
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig

TINY_SSN = SSNConfig(N=6, k=0.005, n=2.0, dt=0.001, max_iter=3000, atol=1e-5,
                     seqlen=400)
TINY_GEN = GeneratorConfig(
    ssn=TINY_SSN,
    bandwidths=(0.25, 1.0),
    contrasts=(5.0,),
    sample_sites=1,
    solver="ift",
    dtype=jnp.float64,
)


def small_gen_cfg(**kw):
    """Multi-condition tiny generator (2 bandwidths x 2 contrasts, 2
    sites): the cwgan/moments/CLI tests need several stimulus conditions
    where TINY_GEN deliberately has almost none. Shared across test
    modules (test_cwgan, test_moments, test_cli, test_driver import it)."""
    base = dict(
        ssn=SSNConfig(N=6, seqlen=100, max_iter=200, atol=1e-4),
        bandwidths=(0.0, 1.0), contrasts=(5.0, 10.0),
        sample_sites=2, track_offset_identity=True,
        include_inhibitory_neurons=False, solver="ift",
    )
    base.update(kw)
    return GeneratorConfig(**base)


def tiny_wgan_cfg(**kw):
    base = dict(gen=TINY_GEN, critic_layers=(16, 16), batch_size=4,
                n_critic=2, n_critic0=2, seed=0)
    base.update(kw)
    return wgan_lib.WGANConfig(**base)


def test_generator_forward_shapes():
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(0), 3
    )
    assert out.tc.shape == (3, TINY_GEN.tc_dim)
    assert out.rates.shape == (3, TINY_GEN.n_stim, TINY_SSN.num_neurons)
    assert bool(out.converged.all())
    # sanity: rates nonnegative-ish (power-law io keeps them >= 0 at the fp)
    assert float(out.rates.min()) >= -1e-6


def test_generator_track_offset_identity_shapes():
    cfg = dataclasses.replace(TINY_GEN, sample_sites=3,
                              track_offset_identity=True,
                              include_inhibitory_neurons=True)
    out = gen_lib.sample_tuning_curves(
        cfg, gen_lib.init_params(cfg), jax.random.PRNGKey(0), 2
    )
    assert cfg.n_probe == 6
    assert out.tc.shape == (2, cfg.n_stim * 6)
    cfg2 = dataclasses.replace(cfg, track_offset_identity=False)
    out2 = gen_lib.sample_tuning_curves(
        cfg2, gen_lib.init_params(cfg2), jax.random.PRNGKey(0), 2
    )
    assert out2.tc.shape == (2 * 6, cfg.n_stim)


def test_wgan_train_step_runs_and_learns():
    cfg = tiny_wgan_cfg()
    state = wgan_lib.init_state(cfg)
    real = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.n_critic, cfg.critic_batch, cfg.gen.tc_dim),
        dtype=jnp.float64,
    ) * 0.1 + 1.0
    state2, m = wgan_lib.train_step(cfg, cfg.n_critic, state, real,
                                    jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    for field in ("d_loss", "g_loss", "wasserstein", "gp"):
        assert np.isfinite(float(getattr(m, field))), field
    # params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.gen_params,
        state2.gen_params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    assert float(m.frac_converged) == 1.0


def test_cwgan_train_step_runs():
    cfg = cwgan_lib.CWGANConfig(gen=TINY_GEN, critic_layers=(16, 16),
                                batch_size=4, n_critic=2, n_critic0=2)
    state = cwgan_lib.init_state(cfg)
    real_fake, _ = cwgan_lib.sample_conditional(
        cfg, state.gen_params, jax.random.PRNGKey(3), cfg.batch_size)
    real_stack = jnp.broadcast_to(
        real_fake[None], (cfg.n_critic,) + real_fake.shape)
    state2, m = cwgan_lib.train_step(cfg, cfg.n_critic, state, real_stack,
                                     jax.random.PRNGKey(4))
    assert int(state2.step) == 1
    assert np.isfinite(float(m.d_loss))
    # tagged sample layout: (B*S, P + 2)
    assert real_fake.shape == (cfg.batch_size * cfg.gen.n_stim,
                               cfg.gen.n_probe + 2)


def test_wgan_moment_anchor_step_and_buffers():
    """Hybrid objective (--moment-anchor): the train step must update the
    moment-EMA buffers, keep everything finite, and actually change the
    generator update relative to the pure-WGAN objective."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 32)
    dmom = mm_lib.data_moments(out.tc)

    cfg0 = tiny_wgan_cfg()
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.9)
    with pytest.raises(ValueError):
        wgan_lib.init_state(cfg)  # anchor needs data moments
    state = wgan_lib.init_state(cfg, data_moments=dmom)
    state0 = wgan_lib.init_state(cfg0)
    real = jax.random.normal(
        jax.random.PRNGKey(1),
        (cfg.n_critic, cfg.critic_batch, cfg.gen.tc_dim),
        dtype=jnp.float64) * 0.1 + 1.0
    s1, m1 = wgan_lib.train_step(cfg, cfg.n_critic, state, real,
                                 jax.random.PRNGKey(2))
    s2, m2 = wgan_lib.train_step(cfg, cfg.n_critic, s1, real,
                                 jax.random.PRNGKey(2))
    # EMA buffers populated, finite, and evolving across steps
    assert float(jnp.abs(s1.mom_ema_mean).max()) > 0
    assert np.isfinite(np.asarray(s2.mom_ema_second)).all()
    assert float(jnp.abs(s2.mom_ema_mean - s1.mom_ema_mean).max()) > 0
    # frozen data moments carried through unchanged
    np.testing.assert_array_equal(np.asarray(s2.data_mean),
                                  np.asarray(dmom[0]))
    # the anchor changes the generator update (same seeds otherwise)
    s1_plain, _ = wgan_lib.train_step(cfg0, cfg0.n_critic, state0, real,
                                      jax.random.PRNGKey(2))
    dj = float(jnp.abs(s1.gen_params["J"] - s1_plain.gen_params["J"]).max())
    assert dj > 0
    assert np.isfinite(float(m1.g_loss)) and np.isfinite(float(m2.g_loss))


def test_cwgan_moment_anchor_step():
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(11), 32)
    dmom = mm_lib.data_moments(out.tc)
    cfg = cwgan_lib.CWGANConfig(gen=TINY_GEN, critic_layers=(16, 16),
                                batch_size=4, n_critic=2, n_critic0=2,
                                moment_anchor=1e-2, moment_ema=0.9)
    state = cwgan_lib.init_state(cfg, data_moments=dmom)
    real_fake, _ = cwgan_lib.sample_conditional(
        cfg, state.gen_params, jax.random.PRNGKey(3), cfg.batch_size)
    real_stack = jnp.broadcast_to(
        real_fake[None], (cfg.n_critic,) + real_fake.shape)
    s1, m = cwgan_lib.train_step(cfg, cfg.n_critic, state, real_stack,
                                 jax.random.PRNGKey(4))
    assert np.isfinite(float(m.g_loss))
    assert float(jnp.abs(s1.mom_ema_mean).max()) > 0
    assert np.isfinite(np.asarray(s1.mom_ema_second)).all()


def test_moment_matching_reduces_loss_toward_truth():
    cfg = mm_lib.MomentMatchingConfig(gen=TINY_GEN, batch_size=8, lr=5e-2)
    true_params = gen_lib.init_params(cfg.gen)  # data from the same params
    out = gen_lib.sample_tuning_curves(cfg.gen, true_params,
                                       jax.random.PRNGKey(10), 64)
    dm, ds = mm_lib.data_moments(out.tc)

    # start from perturbed params; a few steps should reduce the loss
    start = {k: v + 0.3 for k, v in true_params.items()}
    state = mm_lib.MMState(start, mm_lib.make_optimizer(cfg).init(start),
                           jnp.zeros((), jnp.int32))
    losses = []
    for i in range(5):
        state, m = mm_lib.train_step(cfg, state, dm, ds, jax.random.PRNGKey(11))
        losses.append(float(m.loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_gradient_penalty_analytic():
    """With a linear critic D(x) = w.x + b the interpolate gradient is w
    everywhere, so GP must equal (||w|| - 1)^2 exactly."""
    cfg = tiny_wgan_cfg(critic_layers=())
    # critic with no hidden layers: params = {w0 (D,1), b0 (1,)}
    from tcgan_tpu.models import critic as critic_lib

    ccfg = cfg.critic_cfg
    params = critic_lib.init_params(ccfg, jax.random.PRNGKey(0))
    w = np.asarray(params["w0"])[:, 0]
    expected = (np.linalg.norm(w) - 1.0) ** 2
    real = jax.random.normal(jax.random.PRNGKey(1), (16, ccfg.in_dim),
                             dtype=jnp.float64)
    fake = jax.random.normal(jax.random.PRNGKey(2), (16, ccfg.in_dim),
                             dtype=jnp.float64)
    gp = float(wgan_lib.gradient_penalty(cfg, params, real, fake,
                                         jax.random.PRNGKey(3)))
    np.testing.assert_allclose(gp, expected, rtol=1e-5)


def test_clip_grad_changes_update():
    cfg = tiny_wgan_cfg()
    cfg_clip = tiny_wgan_cfg(clip_grad=1e-6)
    state = wgan_lib.init_state(cfg)
    real = jax.random.normal(
        jax.random.PRNGKey(1), (cfg.n_critic, cfg.critic_batch, cfg.gen.tc_dim),
        dtype=jnp.float64) * 0.1 + 1.0
    # optimizer state structure depends on the optax chain -> separate init
    state_clip = wgan_lib.init_state(cfg_clip)
    s1, _ = wgan_lib.train_step(cfg, cfg.n_critic, state, real,
                                jax.random.PRNGKey(2))
    s2, _ = wgan_lib.train_step(cfg_clip, cfg_clip.n_critic, state_clip, real,
                                jax.random.PRNGKey(2))
    d1 = float(jnp.abs(s1.gen_params["J"] - state.gen_params["J"]).max())
    d2 = float(jnp.abs(s2.gen_params["J"] - state.gen_params["J"]).max())
    assert d2 < d1  # tiny clip norm shrinks the step


def test_cwgan_multicontrast_with_inhibitory_probes():
    """Condition grid spans contrasts x bandwidths; probes include I cells."""
    gen = dataclasses.replace(TINY_GEN, contrasts=(2.0, 5.0), sample_sites=2,
                              include_inhibitory_neurons=True)
    cfg = cwgan_lib.CWGANConfig(gen=gen, critic_layers=(8,), batch_size=2,
                                n_critic=2, n_critic0=2)
    assert gen.n_stim == 4 and gen.n_probe == 4
    tagged, out = cwgan_lib.sample_conditional(
        cfg, gen_lib.init_params(gen), jax.random.PRNGKey(0), 2)
    assert tagged.shape == (2 * 4, 4 + 2)
    # condition tags match the battery ordering (bandwidth-major per contrast)
    feats = np.asarray(gen.condition_features())
    np.testing.assert_allclose(np.asarray(tagged[:4, -2:]), feats)
    # critic input dim matches config
    assert cfg.critic_cfg.in_dim == 6


def test_lr_decay_and_gen_ema():
    """lr schedule shrinks step sizes over time; EMA params trail the live
    params and are exported."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tcgan_tpu.models import wgan as wgan_lib
    from tcgan_tpu.models.generator import GeneratorConfig
    from tcgan_tpu.ops.ssn import SSNConfig

    gen = GeneratorConfig(
        ssn=SSNConfig(N=6, k=0.005, n=2.0, dt=0.001, max_iter=800,
                      atol=1e-5),
        bandwidths=(0.25, 1.0), contrasts=(5.0,), sample_sites=1,
        solver="ift",
    )
    cfg = wgan_lib.WGANConfig(gen=gen, critic_layers=(8,), batch_size=4,
                              n_critic=2, n_critic0=2,
                              lr_decay_steps=2, lr_decay_rate=0.1,
                              ema_decay=0.5)
    state = wgan_lib.init_state(cfg)
    assert state.ema_params is not None
    key = jax.random.PRNGKey(0)
    real = 0.1 * jax.random.normal(
        key, (2, cfg.critic_batch, gen.tc_dim)) + 1.0
    s1, _ = wgan_lib.train_step(cfg, 2, state, real, key)
    # EMA trails: ema = 0.5*old + 0.5*new -> halfway between init and live
    mid = 0.5 * (np.asarray(state.gen_params["J"])
                 + np.asarray(s1.gen_params["J"]))
    np.testing.assert_allclose(np.asarray(s1.ema_params["J"]), mid,
                               rtol=1e-6)
    # lr decay: by step 4 the lr fell 100x, so updates shrink ~100x
    s2, _ = wgan_lib.train_step(cfg, 2, s1, real, jax.random.PRNGKey(1))
    s3, _ = wgan_lib.train_step(cfg, 2, s2, real, jax.random.PRNGKey(2))
    s4, _ = wgan_lib.train_step(cfg, 2, s3, real, jax.random.PRNGKey(3))
    d_early = float(jnp.max(jnp.abs(s1.gen_params["J"]
                                    - state.gen_params["J"])))
    d_late = float(jnp.max(jnp.abs(s4.gen_params["J"]
                                   - s3.gen_params["J"])))
    assert d_late < 0.2 * d_early


def test_antithetic_sampling():
    """Antithetic z: second half of the batch uses the negated draws, so
    the z-mean is exactly zero; odd batch raises."""
    import dataclasses

    import jax
    import numpy as np
    import pytest

    from tcgan_tpu.models import generator as gen_lib
    from tcgan_tpu.models.generator import GeneratorConfig
    from tcgan_tpu.ops import weights
    from tcgan_tpu.ops.ssn import SSNConfig

    cfg = GeneratorConfig(
        ssn=SSNConfig(N=6, k=0.005, n=2.0, dt=0.001, max_iter=600,
                      atol=1e-5),
        bandwidths=(0.25, 1.0), contrasts=(5.0,), sample_sites=1,
        solver="ift", antithetic=True,
    )
    import dataclasses

    import jax.numpy as jnp

    params = gen_lib.init_params(cfg)
    key = jax.random.PRNGKey(0)
    out = gen_lib.sample_tuning_curves(cfg, params, key, 8)
    assert out.tc.shape[0] == 8
    # Behavioral pairing check: the antithetic output must equal a plain
    # forward fed the explicitly mirrored z-set [z_half, -z_half] built
    # from the SAME key (sample_tuning_curves passes its key straight to
    # sample_z). Also assert the z-set's batch mean is exactly zero —
    # the variance-reduction property the flag exists for.
    z_half = weights.sample_z(key, (4,), cfg.ssn.N, dtype=cfg.dtype)
    z_full = jnp.concatenate([z_half, -z_half], axis=0)
    # zero up to f32 summation-order noise (z ~ O(1), mean over 8)
    np.testing.assert_allclose(np.asarray(z_full).mean(axis=0), 0.0,
                               atol=1e-6)
    orig_sample_z = gen_lib.weights.sample_z
    try:
        gen_lib.weights.sample_z = lambda *a, **k: z_full
        cfg_plain = dataclasses.replace(cfg, antithetic=False)
        out_plain = gen_lib.sample_tuning_curves(cfg_plain, params, key, 8)
    finally:
        gen_lib.weights.sample_z = orig_sample_z
    np.testing.assert_allclose(np.asarray(out.tc), np.asarray(out_plain.tc),
                               rtol=0, atol=0)
    with pytest.raises(ValueError):
        gen_lib.sample_tuning_curves(cfg, params, jax.random.PRNGKey(0), 7)


def test_moment_matching_fixed_z_is_deterministic():
    """fixed_z (common random numbers): two steps from the same state with
    DIFFERENT keys produce identical losses — the objective is
    deterministic in the parameters."""
    import jax as _jax

    cfg = mm_lib.MomentMatchingConfig(gen=TINY_GEN, batch_size=4,
                                      fixed_z=True)
    data_mean = jnp.ones((TINY_GEN.tc_dim,))
    data_second = jnp.eye(TINY_GEN.tc_dim)
    state = mm_lib.init_state(cfg)
    _, m1 = mm_lib.train_step(cfg, state, data_mean, data_second,
                              _jax.random.PRNGKey(0))
    _, m2 = mm_lib.train_step(cfg, state, data_mean, data_second,
                              _jax.random.PRNGKey(123))
    assert float(m1.loss) == float(m2.loss)

    # and without fixed_z the losses differ (fresh z per key)
    cfg2 = mm_lib.MomentMatchingConfig(gen=TINY_GEN, batch_size=4)
    _, n1 = mm_lib.train_step(cfg2, state._replace(step=jnp.zeros((), jnp.int32)),
                              data_mean, data_second, _jax.random.PRNGKey(0))
    _, n2 = mm_lib.train_step(cfg2, state._replace(step=jnp.zeros((), jnp.int32)),
                              data_mean, data_second, _jax.random.PRNGKey(123))
    assert float(n1.loss) != float(n2.loss)


@pytest.mark.slowtest
def test_moment_ema_reduces_residual_noise():
    """With params FIXED, the EMA'd moment residual after many steps is far
    less noisy than single-batch residuals (effective sample grows)."""
    import jax as _jax

    cfg = mm_lib.MomentMatchingConfig(gen=TINY_GEN, batch_size=8,
                                      moment_ema=0.9, lr=0.0)
    # data moments from a big reference sample of the SAME generator
    out = gen_lib.sample_tuning_curves(TINY_GEN, gen_lib.init_params(TINY_GEN),
                                       _jax.random.PRNGKey(99), 512)
    data_mean, data_second = mm_lib.data_moments(out.tc)
    state = mm_lib.init_state(cfg)
    per_batch = []
    for i in range(25):
        state, m = mm_lib.train_step(cfg, state, data_mean, data_second,
                                     _jax.random.PRNGKey(i))
        per_batch.append(float(m.mean_err))
    # lr=0: params never move, so mean_err measures pure sampling noise of
    # the (EMA'd) moment estimate vs the reference moments; it must shrink
    # as the EMA accumulates
    assert per_batch[-1] < 0.25 * per_batch[0], per_batch[::6]

    # without EMA, the residual stays at the single-batch noise level
    cfg0 = mm_lib.MomentMatchingConfig(gen=TINY_GEN, batch_size=8, lr=0.0)
    state0 = mm_lib.init_state(cfg0)
    raw = []
    for i in range(25):
        state0, m0 = mm_lib.train_step(cfg0, state0, data_mean, data_second,
                                       _jax.random.PRNGKey(i))
        raw.append(float(m0.mean_err))
    assert per_batch[-1] < 0.5 * np.mean(raw[-5:])


def test_reject_unconverged_fakes():
    """With rejection on, the generator loss ignores non-converged fakes:
    when everything converges it equals the unweighted loss; when some
    samples diverge the two differ."""
    import jax as _jax

    cfg_off = tiny_wgan_cfg(batch_size=4)
    cfg_on = tiny_wgan_cfg(batch_size=4, reject_unconverged=True)
    state = wgan_lib.init_state(cfg_off)
    k = _jax.random.PRNGKey(0)
    l_off, _ = wgan_lib.gen_loss_fn(cfg_off, state.gen_params,
                                    state.critic_params, k)
    l_on, _ = wgan_lib.gen_loss_fn(cfg_on, state.gen_params,
                                   state.critic_params, k)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-12)

    # hostile params: strong coupling -> some divergence on the tiny grid
    import dataclasses as _dc

    hostile = gen_lib.init_params(TINY_GEN,
                                  J=((5.0, 0.04), (5.0, 0.03)),
                                  D=((0.5, 0.08), (0.5, 0.08)),
                                  S=((0.25, 0.1), (0.25, 0.1)))
    out = gen_lib.sample_tuning_curves(TINY_GEN, hostile, k, 4)
    if bool(out.converged.all()):  # pragma: no cover - config guard
        pytest.skip("hostile circuit unexpectedly converged everywhere")
    lh_off, _ = wgan_lib.gen_loss_fn(cfg_off, hostile, state.critic_params, k)
    lh_on, _ = wgan_lib.gen_loss_fn(cfg_on, hostile, state.critic_params, k)
    ok = np.asarray(out.converged).all(axis=-1)
    if ok.any():
        # mixed batch: masking must change the loss
        assert float(lh_on) != float(lh_off)
    elif np.asarray(out.converged).any():
        # NO circuit fully converged but some solves did: the absorbing-
        # state fallback (wgan._survivor_chain) weights circuits by their
        # converged-condition fraction instead of deleting the gradient
        # (the rec13anchor freeze) — a weighted loss, not the unweighted one
        w = np.asarray(out.converged).mean(axis=-1)
        assert w.std() == 0 or float(lh_on) != float(lh_off)
    else:
        # not even one solve converged: the _wmean degeneracy guard falls
        # back to the unweighted mean (a silent zero would delete the fake
        # term and unbound the critic — the rec13d blow-up)
        np.testing.assert_allclose(float(lh_on), float(lh_off), rtol=1e-12)
    assert np.isfinite(float(lh_on))

    # full train step runs with rejection enabled
    real = 0.1 * _jax.random.normal(
        k, (cfg_on.n_critic, cfg_on.critic_batch, cfg_on.gen.tc_dim)) + 1.0
    new_state, m = wgan_lib.train_step(cfg_on, cfg_on.n_critic, state, real, k)
    assert np.isfinite(float(m.d_loss)) and np.isfinite(float(m.g_loss))


def test_survivor_chain_absorbing_state_fallback():
    """The rejection mask must never zero out entirely while any solve
    converges (the rec13anchor absorbing state: all-zero mask -> no
    adversarial/anchor gradient, critic explodes on clamped fakes).
    Chain: strict all-conditions mask -> soft converged-fraction weights
    (wgan) / per-solve row mask (cwgan) -> _wmean unweighted guard."""
    import jax.numpy as jnp

    from tcgan_tpu.models import cwgan as cwgan_lib
    from tcgan_tpu.models.wgan import _survivor_chain

    # one fully-converged circuit: strict semantics
    conv = jnp.array([[True, True, True], [True, False, True]])
    w = np.asarray(_survivor_chain(conv, jnp.float64))
    np.testing.assert_allclose(w, [1.0, 0.0])

    # NO fully-converged circuit, partial convergence: soft fractions
    conv = jnp.array([[False, True, True], [True, False, False]])
    w = np.asarray(_survivor_chain(conv, jnp.float64))
    np.testing.assert_allclose(w, [2.0 / 3.0, 1.0 / 3.0])
    assert w.sum() > 0  # gradient survives

    # nothing converged: all-zero (the _wmean guard then takes over)
    conv = jnp.zeros((2, 3), bool)
    np.testing.assert_allclose(
        np.asarray(_survivor_chain(conv, jnp.float64)), 0.0)

    # cwgan rows: strict per-circuit broadcast when any circuit survives...
    ccfg = cwgan_lib.CWGANConfig(gen=TINY_GEN, batch_size=2,
                                 reject_unconverged=True)
    S = TINY_GEN.n_stim

    class FakeOut:
        pass

    out = FakeOut()
    conv = np.zeros((2, S), bool)
    conv[0, :] = True  # circuit 0 fully converged
    conv[1, 0] = True
    out.converged = jnp.asarray(conv)
    w = np.asarray(cwgan_lib.fake_row_weights(ccfg, out))
    np.testing.assert_allclose(w.reshape(2, S)[0], 1.0)
    np.testing.assert_allclose(w.reshape(2, S)[1], 0.0)

    # ...per-solve row mask when none does
    conv[0, 1] = False
    out.converged = jnp.asarray(conv)
    w = np.asarray(cwgan_lib.fake_row_weights(ccfg, out)).reshape(2, S)
    np.testing.assert_allclose(w, np.asarray(conv, float))


@pytest.mark.slowtest
def test_critic_lr_decay_split():
    import optax  # noqa: F401  (optimizers built through wgan_lib)

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


def test_anchor_loss_zero_survivor_holds_ema():
    """A batch where not even one solve converged must NOT blend its
    all-zero 'moments' into the anchor EMA (it is not an estimate); the
    EMA holds and resumes blending when survivors return."""
    from types import SimpleNamespace

    cfg = wgan_lib.WGANConfig(gen=small_gen_cfg())
    B, S, F = 4, cfg.gen.n_stim, 6
    rng = np.random.RandomState(1)
    tc = jnp.asarray(rng.rand(B, F), jnp.float32)
    dm, dsec = mm_lib.data_moments(jnp.asarray(rng.rand(32, F), jnp.float32))
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


def test_anchor_beta1_flag_reaches_optimizer():
    """--anchor-beta1 overrides ONLY the anchor Adam's beta1 (the
    adversarial optimizers keep --adam-beta1); default None inherits it."""
    from tcgan_tpu.run.gan_common import make_gan_parser
    from tcgan_tpu.models.wgan import WGANConfig, make_anchor_optimizer

    p = make_gan_parser("ift")
    args = p.parse_args(["--datastore", "/tmp/x", "--moment-anchor", "1e-2",
                         "--anchor-beta1", "0.9"])
    assert args.anchor_beta1 == 0.9
    args_def = p.parse_args(["--datastore", "/tmp/x"])
    assert args_def.anchor_beta1 is None

    cfg = WGANConfig(gen=TINY_GEN, moment_anchor=1e-2, anchor_beta1=0.9)
    # the optax.adam inside the chain carries b1 via its update closure;
    # verify behaviorally: with beta1=0.9 the first-step Adam update for a
    # constant gradient equals the beta1=0.5 one (bias-corrected), but the
    # SECOND step differs unless beta1 actually changed.
    import jax.numpy as jnp
    import numpy as np
    tx_09 = make_anchor_optimizer(cfg)
    tx_05 = make_anchor_optimizer(
        WGANConfig(gen=TINY_GEN, moment_anchor=1e-2, anchor_beta1=None))
    params = {"J": jnp.ones((2, 2))}
    g1 = {"J": jnp.ones((2, 2)) * 0.3}
    g2 = {"J": jnp.ones((2, 2)) * -0.1}
    outs = []
    for tx in (tx_09, tx_05):
        s = tx.init(params)
        u1, s = tx.update(g1, s, params)
        u2, s = tx.update(g2, s, params)
        outs.append(np.asarray(u2["J"]))
    assert not np.allclose(outs[0], outs[1])


def test_anchor_updates_scan_path():
    """--anchor-updates K > 1: apply_anchor_update runs K composed Adam
    steps on the anchor residual (fresh batch each), advancing the EMA
    debias counter by exactly K and moving the generator params; K = 1
    keeps the original single-update semantics."""
    gen = small_gen_cfg()
    dm_rng = np.random.RandomState(3)
    data_tc = jnp.asarray(dm_rng.rand(64, gen.tc_dim), jnp.float32)
    data_moments = mm_lib.data_moments(data_tc)
    key = jax.random.PRNGKey(0)

    results = {}
    for k_updates in (1, 3):
        cfg = wgan_lib.WGANConfig(gen=gen, batch_size=4,
                                  moment_anchor=5e-3,
                                  anchor_updates=k_updates)
        state = wgan_lib.init_state(cfg, data_moments=data_moments)
        count0 = float(state.mom_ema_count)
        params, fields, aloss = wgan_lib.apply_anchor_update(
            cfg, state, state.gen_params, key)
        assert np.isfinite(float(aloss))
        assert float(fields["mom_ema_count"]) == count0 + k_updates
        moved = jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda p0, p1: float(jnp.abs(p1 - p0).sum()),
                         state.gen_params, params))
        assert moved > 0
        results[k_updates] = params
    # K=3 composes three updates — it must differ from the single update
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         results[1], results[3])
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_gen_lr_schedule_floor_and_switch():
    """Critic-cooling endgame schedule (--gen-lr-floor/--gen-lr-switch-step):
    exponential decay clamps at the floor; the step switch jumps straight
    to it; both off reproduces the plain decay."""
    # plain decay (no floor): halves every 10 steps, unbounded below
    cfg = wgan_lib.WGANConfig(lr_gen=1e-3, lr_decay_steps=10,
                              lr_decay_rate=0.5)
    s = wgan_lib.gen_lr_schedule(cfg)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(100)), 1e-3 * 0.5**10, rtol=1e-6)

    # floor clamps the decay
    cfg_f = dataclasses.replace(cfg, gen_lr_floor=2e-4)
    sf = wgan_lib.gen_lr_schedule(cfg_f)
    np.testing.assert_allclose(float(sf(10)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sf(100)), 2e-4, rtol=1e-6)

    # hard switch: the floor from the switch step on, decay before it
    cfg_sw = dataclasses.replace(cfg, gen_lr_floor=1e-8,
                                 gen_lr_switch_step=15)
    ssw = wgan_lib.gen_lr_schedule(cfg_sw)
    np.testing.assert_allclose(float(ssw(14)), 1e-3 * 0.5**1.4, rtol=1e-6)
    np.testing.assert_allclose(float(ssw(15)), 1e-8, rtol=1e-6)
    np.testing.assert_allclose(float(ssw(1000)), 1e-8, rtol=1e-6)

    # switch works without any decay schedule too
    cfg_c = wgan_lib.WGANConfig(lr_gen=1e-3, gen_lr_floor=0.0,
                                gen_lr_switch_step=5)
    sc = wgan_lib.gen_lr_schedule(cfg_c)
    np.testing.assert_allclose(float(sc(4)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sc(5)), 0.0, atol=0)


def test_gen_lr_switch_step_cools_optimizer_updates():
    """Through the actual generator optimizer: constant gradients, update
    magnitude drops to the floor scale at the switch step (Adam's update
    is linear in lr)."""
    cfg = wgan_lib.WGANConfig(lr_gen=1e-3, gen_lr_floor=1e-6,
                              gen_lr_switch_step=3)
    gen_tx, _ = wgan_lib.make_optimizers(cfg)
    params = {"w": jnp.ones((3,))}
    grads = {"w": jnp.ones((3,))}
    st = gen_tx.init(params)
    mags = []
    for _ in range(5):
        up, st = gen_tx.update(grads, st, params)
        mags.append(float(np.abs(np.asarray(up["w"])).mean()))
    # counts 0,1,2 run at 1e-3; counts 3,4 at the 1e-6 floor
    assert mags[2] > 100 * mags[3], mags
    np.testing.assert_allclose(mags[4] / mags[1], 1e-3, rtol=1e-2)


def test_endgame_scale_and_latch_units():
    """scale_updates_for_endgame: identity until the latch fires, then an
    exact floor/schedule rescale; next_endgame latches on residual
    crossing and never unlatches."""
    cfg = wgan_lib.WGANConfig(lr_gen=1e-3, gen_lr_floor=1e-6,
                              moment_anchor=1e-2,
                              gen_lr_switch_residual=1e-4)
    ups = {"w": jnp.ones((2,)) * 7.0}

    class S:
        step = jnp.asarray(5, jnp.int32)
        endgame = jnp.asarray(False)

    out = wgan_lib.scale_updates_for_endgame(cfg, S, ups)
    np.testing.assert_allclose(np.asarray(out["w"]), 7.0)
    S.endgame = jnp.asarray(True)
    out = wgan_lib.scale_updates_for_endgame(cfg, S, ups)
    np.testing.assert_allclose(np.asarray(out["w"]), 7.0 * 1e-3, rtol=1e-6)

    # trigger off -> identity even if a stray latch is set
    cfg_off = dataclasses.replace(cfg, gen_lr_switch_residual=0.0)
    out = wgan_lib.scale_updates_for_endgame(cfg_off, S, ups)
    np.testing.assert_allclose(np.asarray(out["w"]), 7.0)

    # latch semantics
    S.endgame = jnp.asarray(False)
    assert not bool(wgan_lib.next_endgame(cfg, S, jnp.asarray(2e-4)))
    assert bool(wgan_lib.next_endgame(cfg, S, jnp.asarray(5e-5)))
    S.endgame = jnp.asarray(True)
    assert bool(wgan_lib.next_endgame(cfg, S, jnp.asarray(2e-4)))  # sticky


def test_gen_lr_switch_residual_train_step():
    """Full train step with the auto trigger: the latch flips once the
    anchor residual is under threshold, with a one-step delay before it
    cools the adversarial update; without the anchor, init_state refuses
    the flag; with the trigger off the state field stays None (checkpoint
    structure unchanged)."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 32)
    dmom = mm_lib.data_moments(out.tc)
    mk = lambda thr: tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.9,
                                   gen_lr_floor=0.0,
                                   gen_lr_switch_residual=thr)

    with pytest.raises(ValueError):
        wgan_lib.init_state(tiny_wgan_cfg(gen_lr_switch_residual=1e-3))
    assert wgan_lib.init_state(tiny_wgan_cfg()).endgame is None

    cfg_hot = mk(1e-30)   # never fires
    cfg_cool = mk(1e30)   # fires on the first residual
    real = jax.random.normal(
        jax.random.PRNGKey(1),
        (cfg_hot.n_critic, cfg_hot.critic_batch, cfg_hot.gen.tc_dim),
        dtype=jnp.float64) * 0.1 + 1.0
    s_hot = wgan_lib.init_state(cfg_hot, data_moments=dmom)
    s_cool = wgan_lib.init_state(cfg_cool, data_moments=dmom)
    assert not bool(s_cool.endgame)

    s_hot1, _ = wgan_lib.train_step(cfg_hot, 2, s_hot, real,
                                    jax.random.PRNGKey(2))
    s_cool1, _ = wgan_lib.train_step(cfg_cool, 2, s_cool, real,
                                     jax.random.PRNGKey(2))
    assert not bool(s_hot1.endgame)
    assert bool(s_cool1.endgame)
    # one-step delay: step 1 is identical under either threshold
    np.testing.assert_array_equal(np.asarray(s_hot1.gen_params["J"]),
                                  np.asarray(s_cool1.gen_params["J"]))
    # step 2 diverges: the cooled run's adversarial update is zeroed
    # (floor 0), only the anchor moves it
    s_hot2, _ = wgan_lib.train_step(cfg_hot, 2, s_hot1, real,
                                    jax.random.PRNGKey(3))
    s_cool2, _ = wgan_lib.train_step(
        cfg_cool, 2, s_cool1._replace(endgame=s_cool1.endgame), real,
        jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(s_hot2.gen_params["J"]),
                           np.asarray(s_cool2.gen_params["J"]))
    assert bool(s_cool2.endgame)  # sticky across steps


def test_two_phase_moment_ema_switch():
    """--moment-ema-late / --anchor-ema-late (descend-then-damp, BASELINE
    round-4c orbit sweep): the EMA decay switches at the given step —
    identical states stepped on either side of the boundary blend the
    batch moments with different gammas; off = plain constant gamma."""
    # helper semantics first
    cfg = mm_lib.MomentMatchingConfig(gen=TINY_GEN, moment_ema=0.995,
                                      moment_ema_late=0.98,
                                      moment_ema_switch_step=5)
    assert float(mm_lib.effective_gamma(cfg, jnp.asarray(4))) == 0.995
    assert float(mm_lib.effective_gamma(cfg, jnp.asarray(5))) == pytest.approx(0.98)
    cfg_off = mm_lib.MomentMatchingConfig(gen=TINY_GEN, moment_ema=0.995)
    assert mm_lib.effective_gamma(cfg_off, jnp.asarray(99)) == 0.995

    # through the mm train step: same buffers, steps 4 vs 5 -> the EMA
    # blend uses gamma 0.995 vs 0.98 (fixed_z so the batch is identical)
    cfg = mm_lib.MomentMatchingConfig(gen=TINY_GEN, batch_size=4,
                                      moment_ema=0.995,
                                      moment_ema_late=0.98,
                                      moment_ema_switch_step=5,
                                      fixed_z=True, lr=0.0)
    dm = jnp.ones((TINY_GEN.tc_dim,))
    dsec = jnp.eye(TINY_GEN.tc_dim)
    s0 = mm_lib.init_state(cfg)
    warm = s0._replace(ema_mean=jnp.full_like(dm, 0.5),
                       ema_second=0.25 * jnp.eye(TINY_GEN.tc_dim),
                       ema_count=jnp.asarray(10.0, dm.dtype))
    early = warm._replace(step=jnp.asarray(4, jnp.int32))
    late = warm._replace(step=jnp.asarray(5, jnp.int32))
    k = jax.random.PRNGKey(0)
    s_e, _ = mm_lib.train_step(cfg, early, dm, dsec, k)
    s_l, _ = mm_lib.train_step(cfg, late, dm, dsec, k)
    # identical batch moments b (fixed_z, lr=0): ema' = g*0.5 + (1-g)*b
    # -> recover b from each and check they agree; the gammas differ
    b_e = (np.asarray(s_e.ema_mean) - 0.995 * 0.5) / 0.005
    b_l = (np.asarray(s_l.ema_mean) - 0.98 * 0.5) / 0.02
    np.testing.assert_allclose(b_e, b_l, rtol=1e-4)
    assert not np.allclose(np.asarray(s_e.ema_mean),
                           np.asarray(s_l.ema_mean))

    # anchor side: same switch plumbing through the WGAN config fields
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 32)
    dmom = mm_lib.data_moments(out.tc)
    wcfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.995,
                         anchor_ema_late=0.9, anchor_ema_switch_step=1)
    state = wgan_lib.init_state(wcfg, data_moments=dmom)
    warm = state._replace(mom_ema_mean=jnp.full_like(state.mom_ema_mean, 0.5),
                          mom_ema_count=jnp.asarray(10.0,
                                                    state.data_mean.dtype))
    from types import SimpleNamespace

    fake_out = SimpleNamespace(tc=out.tc[:4],
                               converged=jnp.ones((4, TINY_GEN.n_stim),
                                                  bool))
    _, em_pre, _, _ = wgan_lib.anchor_loss(
        wcfg, warm._replace(step=jnp.asarray(0, jnp.int32)), fake_out)
    _, em_post, _, _ = wgan_lib.anchor_loss(
        wcfg, warm._replace(step=jnp.asarray(1, jnp.int32)), fake_out)
    b_pre = (np.asarray(em_pre) - 0.995 * 0.5) / 0.005
    b_post = (np.asarray(em_post) - 0.9 * 0.5) / 0.1
    np.testing.assert_allclose(b_pre, b_post, rtol=1e-4)


def test_gen_lr_switch_min_step_arms_trigger():
    """The residual trigger must not latch before gen_lr_switch_min_step
    (flagship rec13recipe5: the unarmed trigger latched at step 205 on
    the ridge start's small whitened residual — BASELINE.md round 5);
    from the arming step on, the same residual latches normally."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 32)
    dmom = mm_lib.data_moments(out.tc)
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.9,
                        gen_lr_floor=0.0,
                        gen_lr_switch_residual=1e30,  # fires on anything
                        gen_lr_switch_min_step=3)
    real = jax.random.normal(
        jax.random.PRNGKey(1),
        (cfg.n_critic, cfg.critic_batch, cfg.gen.tc_dim),
        dtype=jnp.float64) * 0.1 + 1.0
    s = wgan_lib.init_state(cfg, data_moments=dmom)
    for i in range(2):  # steps 0, 1 — below the arming step
        s, _ = wgan_lib.train_step(cfg, 2, s, real, jax.random.PRNGKey(i))
        assert not bool(s.endgame), f"latched before min_step at step {i}"
    s, _ = wgan_lib.train_step(cfg, 2, s, real, jax.random.PRNGKey(5))
    assert not bool(s.endgame)  # step 2 still below min_step 3
    s, _ = wgan_lib.train_step(cfg, 2, s, real, jax.random.PRNGKey(6))
    assert bool(s.endgame)  # latched at step 3


def test_drift_latch_requires_late_gamma():
    """anchor_ema_switch_drift with no late gamma to switch to must fail
    loudly (error-loudly convention), not be silently inert."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 16)
    dmom = mm_lib.data_moments(out.tc)
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, anchor_ema_switch_drift=0.3)
    with pytest.raises(ValueError, match="anchor_ema_switch_drift"):
        wgan_lib.init_state(cfg, data_moments=dmom)


def test_drift_latch_descent_vs_orbit():
    """The drift detector's core contract (rec13gammactl counterfactual,
    BASELINE.md round-5 findings 4-6): directional descent holds the
    ratio at ~1 (no latch — a family still descending must not be
    frozen), period-2 oscillation drives it to ~(1-b)/(1+b) (latch), and
    the arming step gates the latch like gen_lr_switch_min_step."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 16)
    dmom = mm_lib.data_moments(out.tc)
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.995,
                        anchor_ema_late=0.98,
                        anchor_ema_switch_step=15,  # arming step
                        anchor_ema_switch_drift=0.3,
                        anchor_drift_ema=0.9)
    state = wgan_lib.init_state(cfg, data_moments=dmom)
    assert state.drift_dir is not None and not bool(state.gamma_late)
    # gamma before any latch is the base gamma
    assert float(wgan_lib.anchor_gamma(cfg, state)) == pytest.approx(0.995)

    # phase 1: monotone descent, 10 steps (past warm-up, still unarmed)
    ratio = None
    for _ in range(10):
        new = jax.tree.map(lambda p: p + 1e-3, state.gen_params)
        fields, ratio = wgan_lib.next_drift_latch(cfg, state, new)
        state = state._replace(gen_params=new, step=state.step + 1,
                               **fields)
    assert float(ratio) > 0.99  # pure descent: |EMA(d)|/EMA(|d|) ~ 1
    assert not bool(state.gamma_late)

    # phase 2: period-2 oscillation -> ratio -> (1-b)/(1+b) ~ 0.053.
    # Steps 10..14 are still below the arming step: even a low ratio
    # must not latch there.
    latch_step = None
    for i in range(30):
        sgn = 1.0 if i % 2 == 0 else -1.0
        new = jax.tree.map(lambda p: p + sgn * 1e-3, state.gen_params)
        fields, ratio = wgan_lib.next_drift_latch(cfg, state, new)
        state = state._replace(gen_params=new, step=state.step + 1,
                               **fields)
        if latch_step is None and bool(state.gamma_late):
            latch_step = int(state.step)
    assert float(ratio) < 0.15
    assert latch_step is not None, "oscillation never latched"
    assert latch_step >= 15, f"latched at {latch_step}, before arming"
    # gamma after the latch is the late gamma, regardless of step count
    assert float(wgan_lib.anchor_gamma(cfg, state)) == pytest.approx(0.98)


def test_drift_latched_gamma_train_step():
    """End-to-end: drift mode threads through the jitted train_step —
    state fields live, drift_ratio recorded, no premature latch (the
    ratio starts at exactly 1), and OFF by default (fields None)."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 32)
    dmom = mm_lib.data_moments(out.tc)
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.995,
                        anchor_ema_late=0.98, anchor_ema_switch_drift=0.3,
                        anchor_drift_ema=0.9)
    real = jax.random.normal(
        jax.random.PRNGKey(1),
        (cfg.n_critic, cfg.critic_batch, cfg.gen.tc_dim),
        dtype=jnp.float64) * 0.1 + 1.0
    s = wgan_lib.init_state(cfg, data_moments=dmom)
    for i in range(2):
        s, m = wgan_lib.train_step(cfg, 2, s, real, jax.random.PRNGKey(i))
    assert s.drift_dir is not None and s.drift_mag is not None
    assert np.isfinite(float(m.drift_ratio))
    assert float(m.drift_ratio) > 0.5  # warm-up side: ratio starts at 1
    assert not bool(s.gamma_late)

    # off by default: state fields None, metric None (no schema noise)
    cfg_off = tiny_wgan_cfg(moment_anchor=1e-2)
    s_off = wgan_lib.init_state(cfg_off, data_moments=dmom)
    assert s_off.drift_dir is None and s_off.gamma_late is None
    s_off, m_off = wgan_lib.train_step(cfg_off, 2, s_off, real,
                                       jax.random.PRNGKey(0))
    assert m_off.drift_ratio is None and s_off.drift_dir is None


def test_vel_latch_flag_contradictions_error_loudly():
    """anchor_ema_switch_vel needs a late gamma, and is mutually
    exclusive with the drift-ratio detector (same latch, two triggers)."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 16)
    dmom = mm_lib.data_moments(out.tc)
    with pytest.raises(ValueError, match="anchor_ema_switch_vel"):
        wgan_lib.init_state(
            tiny_wgan_cfg(moment_anchor=1e-2, anchor_ema_switch_vel=1.0),
            data_moments=dmom)
    with pytest.raises(ValueError, match="pick one"):
        wgan_lib.init_state(
            tiny_wgan_cfg(moment_anchor=1e-2, anchor_ema_late=0.98,
                          anchor_ema_switch_vel=1.0,
                          anchor_ema_switch_drift=0.3),
            data_moments=dmom)


def test_vel_latch_descent_vs_hold():
    """The velocity detector's contract (driftlatch5 live probe,
    BASELINE.md round 5): the statistic equals the true relative
    velocity in %-per-1k under constant descent (debias makes it exact
    from step 1), so descent above threshold never latches; small
    oscillatory hold motion drops it below threshold and latches, gated
    by the arming step; gamma switches on the latch."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 16)
    dmom = mm_lib.data_moments(out.tc)
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.995,
                        anchor_ema_late=0.98,
                        anchor_ema_switch_step=15,  # arming step
                        anchor_ema_switch_vel=1.0,  # %/1k
                        anchor_drift_ema=0.9)
    state = wgan_lib.init_state(cfg, data_moments=dmom)
    assert float(wgan_lib.anchor_gamma(cfg, state)) == pytest.approx(0.995)

    # phase 1: constant log-space descent 1e-3/step = 100 %/1k >> 1.0
    stat = None
    for _ in range(10):
        new = jax.tree.map(lambda p: p + 1e-3, state.gen_params)
        fields, stat = wgan_lib.next_drift_latch(cfg, state, new)
        state = state._replace(gen_params=new, step=state.step + 1,
                               **fields)
    assert float(stat) == pytest.approx(100.0, rel=1e-3)
    assert not bool(state.gamma_late)

    # phase 2: period-2 oscillation, amplitude 1e-5/step -> EMA(delta)
    # -> (1-b)/(1+b)*1e-5 ~ 0.05 %/1k < 1.0 once phase 1's momentum has
    # decayed out of the EMA (0.9^n * 100 %/1k < 1 needs n ~ 45). Steps
    # 10..14 are below the arming step: no latch there regardless.
    latch_step = None
    for i in range(80):
        sgn = 1.0 if i % 2 == 0 else -1.0
        new = jax.tree.map(lambda p: p + sgn * 1e-5, state.gen_params)
        fields, stat = wgan_lib.next_drift_latch(cfg, state, new)
        state = state._replace(gen_params=new, step=state.step + 1,
                               **fields)
        if latch_step is None and bool(state.gamma_late):
            latch_step = int(state.step)
    assert float(stat) < 1.0
    assert latch_step is not None, "hold motion never latched"
    assert latch_step >= 15, f"latched at {latch_step}, before arming"
    assert float(wgan_lib.anchor_gamma(cfg, state)) == pytest.approx(0.98)


def test_vel_latched_gamma_train_step():
    """End-to-end: vel mode threads through the jitted train_step —
    fields live, the velocity statistic is recorded (finite, in the
    drift_ratio column), and the arming step prevents an early latch."""
    out = gen_lib.sample_tuning_curves(
        TINY_GEN, gen_lib.init_params(TINY_GEN), jax.random.PRNGKey(10), 32)
    dmom = mm_lib.data_moments(out.tc)
    cfg = tiny_wgan_cfg(moment_anchor=1e-2, moment_ema=0.995,
                        anchor_ema_late=0.98, anchor_ema_switch_vel=1.0,
                        anchor_ema_switch_step=10,
                        anchor_drift_ema=0.9)
    real = jax.random.normal(
        jax.random.PRNGKey(1),
        (cfg.n_critic, cfg.critic_batch, cfg.gen.tc_dim),
        dtype=jnp.float64) * 0.1 + 1.0
    s = wgan_lib.init_state(cfg, data_moments=dmom)
    for i in range(2):
        s, m = wgan_lib.train_step(cfg, 2, s, real, jax.random.PRNGKey(i))
    assert s.drift_dir is not None
    assert np.isfinite(float(m.drift_ratio))
    assert not bool(s.gamma_late)  # unarmed until step 10
