"""Slow integration test: moment-matching fit recovers known circuit
parameters and closes the tuning-curve W1 gap (the paper's
parameter-recovery benchmark in miniature; SURVEY.md §4 smoke tier +
BASELINE.md W1 gate)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcgan_tpu.analysis.metrics import tc_w1
from tcgan_tpu.data.datasets import generate_fake_truth
from tcgan_tpu.models import generator as gen_lib
from tcgan_tpu.models import moments as mm_lib
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig

pytestmark = pytest.mark.slowtest

# Strongly-coupled but stable circuit: the recurrent term contributes ~10%+
# of the tuning curve, so (J, D, S) are identifiable (a weakly coupled
# circuit makes the fit ill-posed — TCs are then just f(I)).
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


def test_moment_matching_recovers_parameters():
    data = generate_fake_truth(GEN, TRUE_J, TRUE_D, TRUE_S,
                               num_samples=256, batch=128, seed=1)
    dm, ds = mm_lib.data_moments(jnp.asarray(data))

    cfg = mm_lib.MomentMatchingConfig(gen=GEN, batch_size=128, lr=5e-2,
                                      rate_cost=0.0)
    true_params = gen_lib.init_params(GEN, TRUE_J, TRUE_D, TRUE_S)
    # start from J scaled by ~1.35, D/S mildly perturbed
    start = {"J": true_params["J"] + 0.3,
             "D": true_params["D"] - 0.2,
             "S": true_params["S"] + 0.1}
    state = mm_lib.MMState(start, mm_lib.make_optimizer(cfg).init(start),
                           jnp.zeros((), jnp.int32))

    first_loss = None
    key = jax.random.PRNGKey(0)
    best_err = np.inf
    J_true = np.asarray(TRUE_J)
    for i in range(400):
        state, m = mm_lib.train_step(cfg, state, dm, ds, key)
        if first_loss is None:
            first_loss = float(m.loss)
        if i % 25 == 0:
            J_now = np.asarray(jnp.exp(state.gen_params["J"]))
            best_err = min(best_err, float(np.abs(J_now - J_true).mean()))
    final_loss = float(m.loss)
    assert final_loss < 0.25 * first_loss, (first_loss, final_loss)

    # parameter recovery: J must move clearly toward truth during the fit
    # (checked on the 25-step trajectory; late-fit Adam noise can wander)
    J_fit = np.asarray(jnp.exp(state.gen_params["J"]))
    J_start = np.asarray(jnp.exp(start["J"]))
    err_fit = min(best_err, float(np.abs(J_fit - J_true).mean()))
    err_start = float(np.abs(J_start - J_true).mean())
    assert err_fit < 0.6 * err_start, (err_start, err_fit)

    # W1 parity: fitted distribution much closer to data than the start
    def sample_tc(params, key):
        out = gen_lib.sample_tuning_curves(GEN, params, key, 256)
        return np.asarray(out.tc)

    k_eval = jax.random.PRNGKey(9)
    w1_start = tc_w1(sample_tc(start, k_eval), data)
    w1_fit = tc_w1(sample_tc(state.gen_params, k_eval), data)
    assert w1_fit < 0.5 * w1_start, (w1_start, w1_fit)
