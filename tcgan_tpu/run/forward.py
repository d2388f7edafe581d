"""C1: forward-only SSN fixed-point solve + bandwidth tuning-curve sweep.

Reference parity: the forward/"fake-truth generation" path of
``tc_gan/ssnode.py`` driven from the CLI (SURVEY.md §2 "ssnode",
[BASELINE] config C1). Solves a batch of sampled circuits under the full
bandwidth x contrast battery and writes tuning curves + solver diagnostics
into the datastore.

Usage:
    python -m tcgan_tpu.run.forward --datastore /tmp/run1 --batch-size 32
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from tcgan_tpu.run import common


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    common.add_ssn_flags(p)
    common.add_stimulus_flags(p)
    common.add_run_flags(p)
    p.add_argument("--batch-size", type=int, default=32,
                   help="number of sampled circuits per solver batch")
    p.add_argument("--total-samples", type=int, default=0,
                   help="serving/data-generation mode: loop the jitted "
                        "batch until this many circuits are generated "
                        "(rounded up to a --batch-size multiple; 0 = one "
                        "batch). Composes with --parallel mesh.")
    p.add_argument("--solver", choices=("ift", "bptt"), default="ift",
                   help="fixed-point while_loop vs fixed-length Euler scan")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    import contextlib
    import math

    import jax

    from tcgan_tpu.models import generator as gen_lib
    from tcgan_tpu.train.datastore import DataStore
    from tcgan_tpu.utils.stopwatch import StopWatch

    common.enable_compile_cache()
    gen_cfg = common.generator_config_from_args(args, solver=args.solver)

    mesh_cm = None
    n_devices = 1
    if args.parallel == "mesh":
        from tcgan_tpu import parallel as par

        mesh = par.make_mesh()
        n_devices = int(mesh.devices.size)
        gen_cfg = par.with_mesh_axes(gen_cfg)
        mesh_cm = jax.set_mesh(mesh)  # bare-P constraints need the context

    with mesh_cm if mesh_cm is not None else contextlib.nullcontext():
        params = gen_lib.init_params(gen_cfg, common.as22(args.J),
                                     common.as22(args.D), common.as22(args.S))
        store = DataStore(args.datastore)
        store.write_info({"entry": "forward", **vars(args)})

        watch = StopWatch()
        fwd = jax.jit(lambda k: gen_lib.sample_tuning_curves(
            gen_cfg, params, k, args.batch_size))
        n_batches = max(1, math.ceil((args.total_samples or args.batch_size)
                                     / args.batch_size))
        keys = jax.random.split(jax.random.PRNGKey(args.seed),
                                max(n_batches, 2))
        with watch.time("compile+solve"):
            out0 = fwd(keys[0])
            jax.block_until_ready(out0.tc)
        if n_batches == 1:
            # single-batch mode: re-solve once so "solve" is compile-free
            with watch.time("solve"):
                outs = [fwd(keys[1])]
                jax.block_until_ready(outs[0].tc)
            batches_timed = 1
        else:
            # serving mode: the compile batch is kept as data; throughput
            # is measured over the remaining compile-free batches
            outs = [out0]
            with watch.time("solve"):
                for k in keys[1:n_batches]:
                    outs.append(fwd(k))
                jax.block_until_ready(outs[-1].tc)
            batches_timed = n_batches - 1

        cat = (lambda name: np.concatenate(
            [np.asarray(getattr(o, name)) for o in outs], axis=0))
        tc, converged, diverged, iters = (cat(n) for n in (
            "tc", "converged", "diverged", "iters"))
        np.savez(
            store.file("tuning_curves.npz"),
            tuning_curves=tc,
            rates=cat("rates"),
            converged=converged,
            diverged=diverged,
            iters=iters,
        )
        solve_s = max(watch.last("solve"), 1e-9)
        summary = {
            "n_samples": int(tc.shape[0]),
            "tc_dim": int(tc.shape[1]),
            "n_devices": n_devices,
            "frac_converged": float(converged.mean()),
            "frac_diverged": float(diverged.mean()),
            "mean_iters": float(iters.mean()),
            "solve_seconds": watch.last("solve"),
            "compile_plus_solve_seconds": watch.last("compile+solve"),
            "circuits_per_sec": batches_timed * args.batch_size / solve_s,
            "stim_solves_per_sec": (batches_timed * args.batch_size
                                    * gen_cfg.n_stim / solve_s),
        }
        store.finalize("finished", {"summary": summary})
        print(json.dumps(summary))
        return 0


if __name__ == "__main__":
    sys.exit(main())
