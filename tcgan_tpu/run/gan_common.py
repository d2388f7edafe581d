"""Shared main() logic for the WGAN-family entry points."""

from __future__ import annotations

import argparse
from typing import Literal

from tcgan_tpu.run import common


def make_gan_parser(doc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=doc,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    common.add_ssn_flags(p)
    common.add_stimulus_flags(p)
    common.add_gan_flags(p)
    common.add_data_flags(p)
    common.add_run_flags(p)
    return p


def run_gan(args, solver: Literal["ift", "bptt"], conditional: bool) -> int:
    import dataclasses

    # An explicit --normalize-input-mode implies --normalize-input (a mode
    # without the switch would silently run unnormalized); normalize the
    # args object up front so info.json records what actually ran.
    if getattr(args, "normalize_input_mode", None) is not None:
        args.normalize_input = True

    import jax

    from tcgan_tpu.models import cwgan as cwgan_lib
    from tcgan_tpu.models import wgan as wgan_lib
    from tcgan_tpu.train.datastore import DataStore
    from tcgan_tpu.train.driver import DriverConfig, GANDriver

    gen_cfg = common.generator_config_from_args(args, solver=solver)
    if getattr(args, "bptt_checkpoint_chunk", 0):
        gen_cfg = dataclasses.replace(
            gen_cfg, bptt_checkpoint_chunk=args.bptt_checkpoint_chunk
        )
    model = cwgan_lib if conditional else wgan_lib
    mk_cfg = cwgan_lib.CWGANConfig if conditional else wgan_lib.WGANConfig

    step_fn = model.train_step
    if args.parallel == "mesh":
        from tcgan_tpu import parallel as par

        mesh = par.make_mesh()
        gen_cfg = dataclasses.replace(gen_cfg, mesh_axis=par.BATCH_AXIS)
        step_impl = model.train_step_impl
        sharded = par.make_sharded_gan_step(step_impl, mesh)
        step_fn = sharded

    # Real data first (also needed for the input-normalization scale).
    data_gen_cfg = gen_cfg
    if conditional:
        data_gen_cfg = dataclasses.replace(gen_cfg, track_offset_identity=True)
    dataset = common.load_or_generate_dataset(args, data_gen_cfg)

    import numpy as np

    input_scale = None
    cond_input_scale = None
    norm_mode = getattr(args, "normalize_per_condition", None)
    if conditional and norm_mode is not None:
        # Per-(condition, probe) scale: keeps the heavy-tailed near-critical
        # conditions from swamping the critic's per-batch signal
        # (BASELINE.md rec13 stall diagnosis). Tag features normalized to
        # O(1) so contrast ~13 doesn't dominate the He-init first layer.
        tc = np.asarray(dataset.tc).reshape(
            dataset.num_samples, gen_cfg.n_stim, gen_cfg.n_probe)
        if norm_mode == "std":
            denom = tc.std(axis=0)
        else:
            denom = np.abs(tc.mean(axis=0))
        # Floor at 5% of the global TC magnitude: near-silent conditions
        # (e.g. bandwidth 0) have ~zero mean AND ~zero variance, and an
        # eps-only floor would amplify their pure noise by ~1e6 — the
        # critic then rides that one degenerate feature to a runaway
        # Wasserstein (observed: rec13d blow-up, W -> 1e5 by step 2k).
        floor = 0.05 * float(np.abs(tc).mean())
        sp_scale = 1.0 / np.maximum(denom, max(floor, 1e-6))  # (S, P)
        feats = np.asarray(gen_cfg.condition_features())  # (S, 2)
        tag_scale = 1.0 / np.maximum(np.abs(feats).max(axis=0), 1e-6)
        cond_input_scale = tuple(
            float(s) for s in np.concatenate([sp_scale.ravel(), tag_scale]))
    elif getattr(args, "normalize_input", False):
        tc = np.asarray(dataset.tc)
        if getattr(args, "normalize_input_mode", "mean") == "std":
            # Per-feature std scale with the same degeneracy floor as the
            # per-condition path: near-silent features (bandwidth-0
            # conditions) have ~zero std, and an eps-only floor would
            # amplify pure noise (rec13d blow-up mechanism).
            denom = tc.std(axis=0)
            floor = 0.05 * float(np.abs(tc).mean())
            scale = 1.0 / np.maximum(denom, max(floor, 1e-6))
        else:
            mean_tc = tc.mean(axis=0)
            scale = 1.0 / np.maximum(np.abs(mean_tc), 1e-6)
        if conditional:
            # conditional critic sees (per-condition probe block, cond tag)
            n_probe = gen_cfg.n_probe
            probe_scale = scale.reshape(gen_cfg.n_stim, n_probe).mean(axis=0)
            scale = np.concatenate([probe_scale, np.ones(2)])
        input_scale = tuple(float(s) for s in scale)

    cond_weight = None
    if conditional and getattr(args, "contrast_weights", None):
        cw = np.asarray(args.contrast_weights, dtype=np.float64)
        if cw.shape[0] != len(args.contrasts):
            raise SystemExit(
                f"--contrast-weights needs {len(args.contrasts)} values "
                f"(one per --contrasts entry), got {cw.shape[0]}")
        # battery order is contrast-major (ops/stimulus.py
        # condition_features): expand each contrast weight across bandwidths
        per_stim = np.repeat(cw, len(args.bandwidths))
        per_stim = per_stim / per_stim.mean()
        cond_weight = tuple(float(w) for w in per_stim)

    extra_cfg = {}
    if conditional:
        extra_cfg = dict(cond_input_scale=cond_input_scale,
                         cond_weight=cond_weight)
    cfg = mk_cfg(
        gen=gen_cfg,
        input_scale=input_scale,
        critic_lr_decay_steps=getattr(args, "critic_lr_decay_steps", -1),
        **extra_cfg,
        critic_layers=tuple(args.disc_layers),
        batch_size=args.batch_size,
        gp_lambda=args.gp_lambda,
        n_critic=args.n_critic,
        n_critic0=args.n_critic0,
        lr_gen=args.lr_gen,
        lr_critic=args.lr_critic,
        beta1=args.adam_beta1,
        beta2=args.adam_beta2,
        rate_cost=args.rate_cost,
        clip_grad=args.clip_grad,
        lr_decay_steps=args.lr_decay_steps,
        lr_decay_rate=args.lr_decay_rate,
        ema_decay=args.gen_ema,
        reject_unconverged=getattr(args, "reject_unconverged", False),
        moment_anchor=getattr(args, "moment_anchor", 0.0),
        moment_ema=getattr(args, "anchor_ema", 0.995),
        seed=args.seed,
    )

    if conditional:
        import jax.numpy as jnp

        from tcgan_tpu.models.cwgan import tag_with_conditions

        raw = dataset.tc.reshape(dataset.num_samples, cfg.gen.n_stim,
                                 cfg.gen.n_probe)
        tagged = tag_with_conditions(cfg, raw)
        # group per circuit so sampling keeps condition blocks together
        tagged = tagged.reshape(dataset.num_samples, cfg.gen.n_stim, -1)

        def sampler(key, n_stacks, _batch):
            idx = jax.random.randint(key, (n_stacks, cfg.batch_size), 0,
                                     dataset.num_samples)
            return tagged[idx].reshape(n_stacks,
                                       cfg.batch_size * cfg.gen.n_stim, -1)
    else:
        def sampler(key, n_stacks, batch):
            return dataset.sample_stack(key, n_stacks, batch)

    store = DataStore(args.datastore)
    store.write_info({"entry": "cwgan" if conditional else "wgan",
                      "solver": solver, **vars(args)})
    driver_cfg = DriverConfig(
        n_steps=args.n_steps,
        checkpoint_every=args.checkpoint_every,
        tc_mean_every=args.tc_mean_every,
        timing_every=args.timing_every,
        divergence_abort=args.divergence_abort,
        divergence_patience=args.divergence_patience,
        seed=args.seed,
        adaptive_max_iter=(getattr(args, "adaptive_max_iter", "off") == "on"),
        adaptive_margin=getattr(args, "adaptive_margin", 4.0),
    )
    from tcgan_tpu.models import generator as gen_lib
    from tcgan_tpu.train.checkpoint import CheckpointManager

    gen_init = gen_lib.init_params(
        cfg.gen, common.as22(args.J), common.as22(args.D), common.as22(args.S)
    )
    state = model.init_state(
        cfg, gen_init=gen_init,
        data_moments=(dataset.moments()
                      if cfg.moment_anchor > 0 else None))
    ckpt = CheckpointManager(store.subdir("ckpt"))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    driver = GANDriver(cfg, driver_cfg, store, step_fn, state, sampler,
                       checkpoints=ckpt, gen_loss_fn=model.gen_loss_fn)
    from tcgan_tpu.utils.profiling import maybe_trace

    with maybe_trace(getattr(args, "profile_dir", None)):
        driver.run()
    return 0
