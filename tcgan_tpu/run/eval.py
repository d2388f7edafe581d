"""Evaluate a fitted run: tuning-curve distribution parity + parameter
recovery.

Reference parity: the analyzer CLIs of ``tc_gan/analyzers/`` (SURVEY.md §2
"Analyzers / loaders") — TC-distribution comparison and parameter-recovery
metrics; the W1 number is the parity gate named in BASELINE.md.

Usage:
    python -m tcgan_tpu.run.eval --run runs/gan --datastore runs/gan_eval \
        [--dataset data.npz | --true-J ... --true-D ... --true-S ...] \
        [same SSN/stimulus flags as the training run]

Loads the final generator parameters from the run's ``generator.csv``,
samples tuning curves, and prints a JSON line with W1 / sliced-W1 against
the dataset and relative parameter-recovery errors against the true params
(when given).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from tcgan_tpu.run import common


def _plot_tc_comparison(gen_tc: np.ndarray, data_tc: np.ndarray, out_path):
    """Mean tuning curve +/- std, generated vs data (the reference
    analyzers' TC-distribution comparison plot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (a0, a1) = plt.subplots(1, 2, figsize=(11, 4))
    xs = np.arange(gen_tc.shape[1])
    for tc, label, color in ((data_tc, "data", "C0"), (gen_tc, "generated", "C1")):
        m, s = tc.mean(0), tc.std(0)
        a0.plot(xs, m, color=color, label=label)
        a0.fill_between(xs, m - s, m + s, color=color, alpha=0.25)
    a0.set_xlabel("tuning-curve feature (condition index)")
    a0.set_ylabel("rate")
    a0.set_title("mean tuning curve ± std")
    a0.legend()
    # per-feature marginals at the most informative feature
    fidx = int(np.argmax(data_tc.std(0)))
    a1.hist(data_tc[:, fidx], bins=30, alpha=0.6, label="data", density=True)
    a1.hist(gen_tc[:, fidx], bins=30, alpha=0.6, label="generated",
            density=True)
    a1.set_title(f"marginal at feature {fidx}")
    a1.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    common.add_ssn_flags(p)
    common.add_stimulus_flags(p)
    common.add_data_flags(p)
    p.add_argument("--run", type=str, required=True,
                   help="datastore of the fitted run (reads generator.csv)")
    p.add_argument("--datastore", type=str, default=None,
                   help="optional dir to write eval artifacts")
    p.add_argument("--eval-samples", type=int, default=256,
                   help="generated circuits for the comparison")
    p.add_argument("--params-source", choices=("csv", "npz", "npz_ema"),
                   default="csv",
                   help="fitted params: final generator.csv row (csv), the "
                        "disc_params.npz export (npz), or its EMA-averaged "
                        "J_ema/D_ema/S_ema entries (npz_ema; requires a run "
                        "trained with --gen-ema)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", choices=("float32", "bfloat16", "float64"),
                   default="float32")
    p.add_argument("--no-run-config", action="store_true",
                   help="do NOT default-load the SSN/stimulus/data config "
                        "from the run's info.json (then every scientific "
                        "flag must be retyped to match the training run)")
    return p


def main(argv=None):
    parser = make_parser()
    args = parser.parse_args(argv)
    # Default-load the training run's recorded scientific config so a bare
    # `eval --run <dir>` reproduces the training battery/readout/SSN setup
    # exactly; explicit CLI flags override (loudly — evaluating with
    # mismatched bandwidths/contrasts/probes silently corrupts W1 and
    # recovery numbers otherwise).
    overrides = []
    if not args.no_run_config:
        overrides = common.apply_run_config(args, parser, argv, args.run)
    common.enable_compile_cache()
    import jax

    from tcgan_tpu.analysis import load_run
    from tcgan_tpu.analysis.loaders import fitted_params
    from tcgan_tpu.analysis.metrics import (
        param_recovery_error, sliced_w1, tc_w1,
    )
    from tcgan_tpu.models import generator as gen_lib

    gen_cfg = common.generator_config_from_args(args, solver="ift")
    rec = load_run(args.run)
    # {"J","D","S"} 2x2 value-space
    fitted = fitted_params(args.run, args.params_source, rec=rec)
    params = gen_lib.init_params(
        gen_cfg, tuple(map(tuple, fitted["J"])),
        tuple(map(tuple, fitted["D"])), tuple(map(tuple, fitted["S"])),
    )

    forward = jax.jit(lambda k: gen_lib.sample_tuning_curves(
        gen_cfg, params, k, args.eval_samples))
    out = forward(jax.random.PRNGKey(args.seed))
    ok = np.asarray(out.converged.all(axis=-1))
    tc = np.asarray(out.tc)
    spc = gen_cfg.samples_per_circuit()
    gen_tc = tc[np.repeat(ok, spc)] if not gen_cfg.track_offset_identity else tc[ok]

    if gen_tc.shape[0] == 0:
        # The fitted parameters sit in the divergent region — exactly the
        # runs one most wants to diagnose. Report that honestly instead
        # of crashing inside np.quantile on a zero-row array.
        print(json.dumps({
            "n_gen": 0,
            "frac_converged": float(np.asarray(out.converged).mean()),
            "fitted_params": {k: np.asarray(v).tolist()
                              for k, v in fitted.items()},
            "error": "no generated sample survived the run's survivor "
                     "selection — W1 metrics undefined",
        }))
        return 1

    dataset = common.load_or_generate_dataset(args, gen_cfg)
    data_tc = np.asarray(dataset.tc)

    result = {
        "n_gen": int(gen_tc.shape[0]),
        "n_data": int(data_tc.shape[0]),
        "tc_w1": tc_w1(gen_tc, data_tc),
        "sliced_w1": sliced_w1(gen_tc, data_tc),
        "frac_converged": float(np.asarray(out.converged).mean()),
        "fitted_params": {k: np.asarray(v).tolist() for k, v in fitted.items()},
    }
    if overrides:
        result["config_overrides"] = overrides
    if not args.dataset:
        # Fake-truth run: the truth is always known — resolve_true_params
        # is the SAME fallback chain dataset generation used, so recovery
        # errors are computed against the dataset's actual ground truth
        # even when the run trained on the DEFAULT_J/D/S fallback (all
        # --true-* flags absent).
        tj, td, ts = common.resolve_true_params(args)
        true = {"J": np.asarray(tj), "D": np.asarray(td),
                "S": np.asarray(ts)}
        result["param_recovery_error"] = param_recovery_error(
            {k: np.asarray(v) for k, v in fitted.items()}, true)

    if args.datastore:
        from tcgan_tpu.analysis.tc_grid import plot_tc_grid
        from tcgan_tpu.train.datastore import DataStore

        store = DataStore(args.datastore)
        store.write_info({"entry": "eval", **vars(args)})
        np.savez(store.file("eval_tuning_curves.npz"), gen_tc=gen_tc,
                 data_tc=data_tc)
        _plot_tc_comparison(gen_tc, data_tc, store.file("tc_comparison.png"))
        # paper-style per-condition marginal grid (labels only meaningful
        # when each tc feature IS one stimulus condition)
        labels = (np.asarray(gen_cfg.condition_features()).tolist()
                  if gen_tc.shape[1] == gen_cfg.n_stim else None)
        w1s = plot_tc_grid(gen_tc, data_tc, labels,
                           store.file("tc_grid.png"))
        result["per_condition_w1"] = [round(float(w), 6) for w in w1s]
        store.finalize("finished", {"result": result})
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
