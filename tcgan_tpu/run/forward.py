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
                   help="number of sampled circuits")
    p.add_argument("--solver", choices=("ift", "bptt"), default="ift",
                   help="fixed-point while_loop vs fixed-length Euler scan")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    import jax

    from tcgan_tpu.models import generator as gen_lib
    from tcgan_tpu.train.datastore import DataStore
    from tcgan_tpu.utils.stopwatch import StopWatch

    common.enable_compile_cache()
    gen_cfg = common.generator_config_from_args(args, solver=args.solver)
    params = gen_lib.init_params(gen_cfg, common.as22(args.J),
                                 common.as22(args.D), common.as22(args.S))
    store = DataStore(args.datastore)
    store.write_info({"entry": "forward", **vars(args)})

    watch = StopWatch()
    fwd = jax.jit(lambda k: gen_lib.sample_tuning_curves(
        gen_cfg, params, k, args.batch_size))
    key = jax.random.PRNGKey(args.seed)
    with watch.time("compile+solve"):
        out = fwd(key)
        jax.block_until_ready(out.tc)
    with watch.time("solve"):
        out = fwd(jax.random.split(key)[0])
        jax.block_until_ready(out.tc)

    tc = np.asarray(out.tc)
    np.savez(
        store.file("tuning_curves.npz"),
        tuning_curves=tc,
        rates=np.asarray(out.rates),
        converged=np.asarray(out.converged),
        diverged=np.asarray(out.diverged),
        iters=np.asarray(out.iters),
    )
    summary = {
        "n_samples": int(tc.shape[0]),
        "tc_dim": int(tc.shape[1]),
        "frac_converged": float(np.asarray(out.converged).mean()),
        "frac_diverged": float(np.asarray(out.diverged).mean()),
        "mean_iters": float(np.asarray(out.iters).mean()),
        "solve_seconds": watch.last("solve"),
        "compile_plus_solve_seconds": watch.last("compile+solve"),
    }
    store.finalize("finished", {"summary": summary})
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
