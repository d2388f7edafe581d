"""Slow integration test: the WGAN-GP assembly trains end-to-end — the
GAN-recovery regression fence asked for by VERDICT r2 #5 (a regression in
the WGAN loss/schedule assembly must surface here, not in multi-hour
manual runs).

What a 3-minute single-seed GAN on a tiny battery can honestly fence
(measured across recipe variants in round 3): full convergence is NOT
reliable at this budget — the adversarial dynamics oscillate — but three
assembly-level behaviors are robust across seeds/recipes:

1. the critic LEARNS: its rank accuracy rises far above chance (critic
   loss + GP + optimizer wiring);
2. the generator RESPONDS: accuracy falls back substantially after its
   peak — the generator moved through the SSN solver to fool the critic
   (generator gradients through the implicit solve);
3. the distribution gap SHRINKS: best-over-trajectory tuning-curve W1
   drops well below the start (end-to-end signal direction).

Full parameter-recovery assertions live in the moment-matching slow test
(tests/test_recovery_slow.py) and the multi-hour science runs
(BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.analysis.metrics import tc_w1
from tcgan_tpu.data.datasets import generate_fake_truth
from tcgan_tpu.models import generator as gen_lib
from tcgan_tpu.models import wgan as wgan_lib
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig

pytestmark = pytest.mark.slowtest

# Same strongly-coupled circuit as the moment-matching slow test.
GEN = GeneratorConfig(
    ssn=SSNConfig(N=8, k=0.01, n=2.0, dt=0.0005, max_iter=8000, atol=1e-6),
    bandwidths=(0.25, 0.5, 1.0),
    contrasts=(20.0,),
    sample_sites=1,
    solver="ift",
    dtype=jnp.float64,
)
TRUE_J = ((0.30, 0.27), (0.30, 0.21))
TRUE_D = ((0.05, 0.04), (0.05, 0.04))
TRUE_S = ((0.25, 0.1), (0.25, 0.1))


def test_wgan_assembly_trains_end_to_end():
    data = generate_fake_truth(GEN, TRUE_J, TRUE_D, TRUE_S,
                               num_samples=512, batch=128, seed=1)
    data = jnp.asarray(data)

    mean_tc = np.asarray(data).mean(axis=0)
    input_scale = tuple(float(s) for s in
                        1.0 / np.maximum(np.abs(mean_tc), 1e-6))
    cfg = wgan_lib.WGANConfig(
        gen=GEN, critic_layers=(32, 32), batch_size=64,
        n_critic=5, n_critic0=20, lr_gen=5e-3, lr_critic=1e-3,
        clip_grad=1.0, rate_cost=0.0, input_scale=input_scale, seed=0,
    )
    true_params = gen_lib.init_params(GEN, TRUE_J, TRUE_D, TRUE_S)
    start = {"J": true_params["J"] + 0.3,
             "D": true_params["D"],
             "S": true_params["S"]}
    state = wgan_lib.init_state(cfg, gen_init=jax.tree.map(jnp.copy, start))

    key = jax.random.PRNGKey(0)
    n_data = data.shape[0]

    def sample_real(k, n_critic):
        idx = jax.random.randint(k, (n_critic, cfg.critic_batch), 0, n_data)
        return data[idx]

    def w1_now(params, k):
        return tc_w1(np.asarray(
            gen_lib.sample_tuning_curves(GEN, params, k, 256).tc),
            np.asarray(data))

    k_eval = jax.random.PRNGKey(9)
    w1_start = w1_now(start, k_eval)

    accs, w1s = [], []
    for step in range(300):
        key, k_data, k_step = jax.random.split(key, 3)
        n_critic = cfg.n_critic0 if step == 0 else cfg.n_critic
        state, m = wgan_lib.train_step(cfg, n_critic, state,
                                       sample_real(k_data, n_critic), k_step)
        accs.append(float(m.d_accuracy))
        assert np.isfinite(float(m.d_loss)), step
        assert np.isfinite(float(m.g_loss)), step
        if step % 25 == 0 and step > 0:
            w1s.append(w1_now(state.gen_params, k_eval))

    accs = np.asarray(accs)
    # 1) the critic learned to separate real from fake
    peak = float(accs.max())
    assert peak >= 0.85, peak
    # 2) the generator responded: accuracy fell back well below the peak
    #    after it was reached (generator gradient flows through the solver)
    after_peak = accs[int(accs.argmax()):]
    assert float(after_peak.min()) <= peak - 0.25, (peak, after_peak.min())
    # 3) the TC distribution gap shrank materially at some point
    assert min(w1s) < 0.75 * w1_start, (w1_start, min(w1s), w1s)


def test_wgan_moment_anchor_recovers_parameters():
    """The hybrid objective (--moment-anchor) must do what the pure WGAN
    at this budget cannot: RECOVER parameters on an identifiable battery.
    Same circuit/offset as the moment-matching slow test (which proves the
    J direction is identifiable here); the anchor's EMA-moment residual
    should pull J toward truth within a few hundred steps while the
    adversarial term stays finite. Best-over-trajectory (as in the mm
    slow test): late-fit adversarial noise can kick the estimate around
    at this tiny batch — the production damping levers (lr decay, gen
    EMA) are deliberately off here to keep the fence about the anchor."""
    from tcgan_tpu.models.moments import data_moments

    data = generate_fake_truth(GEN, TRUE_J, TRUE_D, TRUE_S,
                               num_samples=512, batch=128, seed=1)
    data = jnp.asarray(data)
    cfg = wgan_lib.WGANConfig(
        gen=GEN, critic_layers=(32, 32), batch_size=64,
        n_critic=2, n_critic0=10, lr_gen=1e-3, lr_critic=1e-3,
        clip_grad=1.0, rate_cost=0.0, seed=0,
        # anchor lr = the mm slow test's lr (which recovers J here);
        # production-like anchor:adversarial lr ratio; short EMA so the
        # buffer warms up within the budget
        moment_anchor=5e-2, moment_ema=0.9,
    )
    true_params = gen_lib.init_params(GEN, TRUE_J, TRUE_D, TRUE_S)
    start = {"J": true_params["J"] + 0.3,
             "D": true_params["D"],
             "S": true_params["S"]}
    state = wgan_lib.init_state(cfg, gen_init=jax.tree.map(jnp.copy, start),
                                data_moments=data_moments(data))

    def j_err(params):
        J, _, _ = gen_lib.param_values_np(GEN, params)
        return float(np.abs(J - np.asarray(TRUE_J)).mean())

    err_start = j_err(state.gen_params)
    key = jax.random.PRNGKey(0)
    n_data = data.shape[0]
    best_err = np.inf
    for step in range(300):
        key, k_data, k_step = jax.random.split(key, 3)
        n_critic = cfg.n_critic0 if step == 0 else cfg.n_critic
        idx = jax.random.randint(k_data, (n_critic, cfg.critic_batch),
                                 0, n_data)
        state, m = wgan_lib.train_step(cfg, n_critic, state, data[idx],
                                       k_step)
        assert np.isfinite(float(m.g_loss)), step
        if step % 25 == 0 and step > 0:
            best_err = min(best_err, j_err(state.gen_params))
    # same bar as the mm slow test's parameter-recovery assertion
    assert best_err < 0.6 * err_start, (err_start, best_err)
