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
    import contextlib
    import dataclasses

    import jax

    common.enable_compile_cache()

    from tcgan_tpu.models import cwgan as cwgan_lib
    from tcgan_tpu.models import wgan as wgan_lib

    gen_cfg = common.generator_config_from_args(args, solver=solver)
    if getattr(args, "bptt_checkpoint_chunk", 0):
        gen_cfg = dataclasses.replace(
            gen_cfg, bptt_checkpoint_chunk=args.bptt_checkpoint_chunk
        )
    model = cwgan_lib if conditional else wgan_lib
    mk_cfg = cwgan_lib.CWGANConfig if conditional else wgan_lib.WGANConfig

    step_fn = model.train_step
    mesh_cm = None
    if args.parallel == "mesh":
        from tcgan_tpu import parallel as par

        mesh = par.make_mesh()
        gen_cfg = par.with_mesh_axes(gen_cfg)
        step_impl = model.train_step_impl
        sharded = par.make_sharded_gan_step(step_impl, mesh)
        step_fn = sharded
        # The generator's internal sharding constraints are bare
        # PartitionSpecs, which resolve only inside a mesh context — and
        # fake-truth generation below runs the SAME constrained gen_cfg,
        # so the context must span the whole run, not just train steps
        # (the ensemble CLI sets the precedent).
        mesh_cm = jax.set_mesh(mesh)

    with mesh_cm if mesh_cm is not None else contextlib.nullcontext():
        return _run_gan_body(args, solver, conditional, gen_cfg, model,
                             mk_cfg, step_fn)


def _run_gan_body(args, solver, conditional, gen_cfg, model, mk_cfg,
                  step_fn) -> int:
    import dataclasses

    import jax

    from tcgan_tpu.train.datastore import DataStore
    from tcgan_tpu.train.driver import DriverConfig, GANDriver

    # Real data first (also needed for the input-normalization scale).
    data_gen_cfg = gen_cfg
    if conditional:
        data_gen_cfg = dataclasses.replace(gen_cfg, track_offset_identity=True)
    dataset = common.load_or_generate_dataset(args, data_gen_cfg)

    input_scale, cond_input_scale = common.critic_input_scales(
        args, gen_cfg, dataset, conditional)
    cond_weight = common.contrast_cond_weight(args, conditional)

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
        gen_lr_floor=getattr(args, "gen_lr_floor", 0.0),
        gen_lr_switch_step=getattr(args, "gen_lr_switch_step", 0),
        gen_lr_switch_residual=getattr(args, "gen_lr_switch_residual", 0.0),
        gen_lr_switch_min_step=getattr(args, "gen_lr_switch_min_step", 0),
        ema_decay=args.gen_ema,
        reject_unconverged=getattr(args, "reject_unconverged", False),
        moment_anchor=getattr(args, "moment_anchor", 0.0),
        moment_ema=getattr(args, "anchor_ema", 0.995),
        anchor_ema_late=getattr(args, "anchor_ema_late", 0.0),
        anchor_ema_switch_step=getattr(args, "anchor_ema_switch_step", 0),
        anchor_ema_switch_drift=getattr(args, "anchor_ema_switch_drift",
                                        0.0),
        anchor_ema_switch_vel=getattr(args, "anchor_ema_switch_vel", 0.0),
        anchor_drift_ema=getattr(args, "anchor_drift_ema", 0.995),
        anchor_beta1=getattr(args, "anchor_beta1", None),
        anchor_updates=getattr(args, "anchor_updates", 1),
        seed=args.seed,
    )

    if conditional:
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
