"""TPU experiment: WGAN-GP step time + short parameter-recovery fit."""
import time, dataclasses
import jax, jax.numpy as jnp, numpy as np
from tcgan_tpu.models import wgan as wgan_lib, generator as gen_lib
from tcgan_tpu.models.generator import GeneratorConfig
from tcgan_tpu.ops.ssn import SSNConfig
from tcgan_tpu.data.datasets import TuningCurveDataset, generate_fake_truth
from tcgan_tpu.analysis.metrics import tc_w1

TRUE_J = ((0.045, 0.040), (0.050, 0.035))
TRUE_D = ((0.10, 0.08), (0.10, 0.08))
TRUE_S = ((0.25, 0.10), (0.25, 0.10))

for backend in ("xla", "pallas"):
    gen_cfg = GeneratorConfig(
        ssn=SSNConfig(N=51, k=0.01, n=2.2, dt=0.0005, max_iter=8000,
                      atol=1e-4, backend=backend, check_every=16,
                      pallas_block_b=16),
        bandwidths=(0.0, 0.0625, 0.125, 0.1875, 0.25, 0.5, 0.75, 1.0),
        contrasts=(10.0,), sample_sites=1, solver="ift",
    )
    cfg = wgan_lib.WGANConfig(gen=gen_cfg, critic_layers=(128, 128),
                              batch_size=32, n_critic=5, n_critic0=5,
                              gp_lambda=10.0, lr_gen=2e-4, lr_critic=1e-3,
                              rate_cost=0.01, seed=0)
    t0 = time.time()
    data = generate_fake_truth(gen_cfg, TRUE_J, TRUE_D, TRUE_S,
                               num_samples=1024, batch=256, seed=7)
    ds = TuningCurveDataset.from_array(data)
    print(f'[{backend}] truth generated {data.shape} in {time.time()-t0:.1f}s',
          flush=True)

    start = gen_lib.init_params(
        gen_cfg,
        tuple(tuple(x * 1.3 for x in row) for row in TRUE_J),
        tuple(tuple(x * 0.8 for x in row) for row in TRUE_D),
        TRUE_S)
    state = wgan_lib.init_state(cfg, gen_init=start)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    k1, k2 = jax.random.split(key)
    real = ds.sample_stack(k1, cfg.n_critic, cfg.critic_batch)
    state, m = wgan_lib.train_step(cfg, cfg.n_critic, state, real, k2)
    jax.block_until_ready(m)
    print(f'[{backend}] train_step compiled+ran in {time.time()-t0:.1f}s', flush=True)

    t0 = time.time()
    NSTEP = 200 if backend == "xla" else 20
    for i in range(NSTEP):
        key, k1, k2 = jax.random.split(key, 3)
        real = ds.sample_stack(k1, cfg.n_critic, cfg.critic_batch)
        state, m = wgan_lib.train_step(cfg, cfg.n_critic, state, real, k2)
        if i % 25 == 0:
            jax.block_until_ready(m)
            print(f'[{backend}] step {i}: d={float(m.d_loss):.4f} g={float(m.g_loss):.4f} '
                  f'W={float(m.wasserstein):.4f} conv={float(m.frac_converged):.2f}',
                  flush=True)
    jax.block_until_ready(m)
    dt_step = (time.time() - t0) / NSTEP
    print(f'[{backend}] WGAN-GP step time: {dt_step*1000:.1f} ms/step '
          f'(batch 32 circuits x 8 stim, n_critic=5)', flush=True)

    if backend == "xla":
        J_fit = np.asarray(jnp.exp(state.gen_params["J"]))
        err0 = np.abs(np.asarray(TRUE_J) * 1.3 - np.asarray(TRUE_J)).mean()
        err1 = np.abs(J_fit - np.asarray(TRUE_J)).mean()
        out = gen_lib.sample_tuning_curves(gen_cfg, state.gen_params,
                                           jax.random.PRNGKey(5), 256)
        start_out = gen_lib.sample_tuning_curves(gen_cfg, start,
                                                 jax.random.PRNGKey(5), 256)
        w1_fit = tc_w1(np.asarray(out.tc), data)
        w1_start = tc_w1(np.asarray(start_out.tc), data)
        print(f'[xla] J err start={err0:.4f} fit={err1:.4f}; '
              f'W1 start={w1_start:.4f} fit={w1_fit:.4f}', flush=True)
