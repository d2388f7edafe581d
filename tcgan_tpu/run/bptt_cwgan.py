"""C4: conditional WGAN over stimulus conditions (contrast x bandwidth).

Reference parity: ``tc_gan/run/bptt_cwgan.py`` + ``tc_gan/networks/cwgan.py``
(SURVEY.md §2 "Conditional WGAN"). The critic is conditioned on the
(bandwidth, contrast) tag of every sample; defaults to BPTT gradients like
the reference's bptt_cwgan (use ``--solver ift`` for the implicit-diff
variant).

Usage:
    python -m tcgan_tpu.run.bptt_cwgan --datastore /tmp/run_cwgan
"""

from __future__ import annotations

import sys

from tcgan_tpu.run.gan_common import make_gan_parser, run_gan


def make_parser():
    p = make_gan_parser(__doc__)
    p.add_argument("--solver", choices=("bptt", "ift"), default="bptt")
    p.add_argument("--bptt-checkpoint-chunk", type=int, default=0,
                   help="remat chunk size (0 = no checkpointing); the "
                        "memory lever for long --seqlen BPTT runs")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    return run_gan(args, solver=args.solver, conditional=True)


if __name__ == "__main__":
    sys.exit(main())
