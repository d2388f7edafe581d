"""TPU: WGAN-GP recovery fit on a strongly-coupled circuit."""
import time
import jax, jax.numpy as jnp, numpy as np
from tcgan_tpu.models import wgan as wgan_lib, generator as gen_lib
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig
from tcgan_tpu.data.datasets import TuningCurveDataset, generate_fake_truth
from tcgan_tpu.analysis.metrics import tc_w1

TRUE_J = ((0.30, 0.27), (0.30, 0.21))
TRUE_D = ((0.08, 0.06), (0.08, 0.06))
TRUE_S = ((0.25, 0.10), (0.25, 0.10))

gen_cfg = GeneratorConfig(
    ssn=SSNConfig(N=51, k=0.01, n=2.0, dt=0.0005, max_iter=8000, atol=1e-4),
    bandwidths=(0.0, 0.0625, 0.125, 0.1875, 0.25, 0.5, 0.75, 1.0),
    contrasts=(20.0,), sample_sites=1, solver="ift",
)
data = generate_fake_truth(gen_cfg, TRUE_J, TRUE_D, TRUE_S,
                           num_samples=2048, batch=256, seed=7)
ds = TuningCurveDataset.from_array(data)
scale = tuple(float(s) for s in 1.0 / np.maximum(np.abs(data.mean(0)), 1e-6))
print(f'truth {data.shape} tc_mean={data.mean():.2f}', flush=True)

cfg = wgan_lib.WGANConfig(gen=gen_cfg, critic_layers=(128, 128),
                          batch_size=64, n_critic=5, n_critic0=5,
                          gp_lambda=10.0, lr_gen=5e-4, lr_critic=1e-3,
                          rate_cost=0.01, seed=0, input_scale=scale)
start = gen_lib.init_params(
    gen_cfg,
    tuple(tuple(x * 1.3 for x in row) for row in TRUE_J),
    tuple(tuple(x * 0.7 for x in row) for row in TRUE_D),
    TRUE_S)
state = wgan_lib.init_state(cfg, gen_init=start)

key = jax.random.PRNGKey(0)
t0 = time.time()
NSTEP = 6000
for i in range(NSTEP):
    key, k1, k2 = jax.random.split(key, 3)
    real = ds.sample_stack(k1, cfg.n_critic, cfg.critic_batch)
    state, m = wgan_lib.train_step(cfg, cfg.n_critic, state, real, k2)
    if i % 500 == 0:
        jax.block_until_ready(m)
        J_now = np.asarray(jnp.exp(state.gen_params["J"]))
        jerr = np.abs(J_now - np.asarray(TRUE_J)).mean()
        print(f'step {i}: d={float(m.d_loss):.4f} W={float(m.wasserstein):.4f} '
              f'acc={float(m.d_accuracy):.2f} conv={float(m.frac_converged):.2f} '
              f'Jerr={jerr:.4f}', flush=True)
jax.block_until_ready(m)
print(f'step time {(time.time()-t0)/NSTEP*1000:.1f} ms', flush=True)

J_fit = np.asarray(jnp.exp(state.gen_params["J"]))
err0 = np.abs(np.asarray(TRUE_J) * 0.3).mean()
err1 = np.abs(J_fit - np.asarray(TRUE_J)).mean()
out = gen_lib.sample_tuning_curves(gen_cfg, state.gen_params, jax.random.PRNGKey(5), 512)
start_out = gen_lib.sample_tuning_curves(gen_cfg, start, jax.random.PRNGKey(5), 512)
ok = np.asarray(out.converged.all(-1)); ok0 = np.asarray(start_out.converged.all(-1))
w1_fit = tc_w1(np.asarray(out.tc)[ok], data)
w1_start = tc_w1(np.asarray(start_out.tc)[ok0], data)
print(f'J err start={err0:.4f} fit={err1:.4f}; W1 start={w1_start:.4f} fit={w1_fit:.4f}', flush=True)
print('J fit', J_fit, flush=True)
