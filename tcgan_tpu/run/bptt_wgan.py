"""C3: WGAN-GP fit with BPTT gradients through the unrolled Euler scan.

Reference parity: ``tc_gan/run/bptt_wgan.py`` (SURVEY.md §3.1) — gradients
flow through a fixed-length ``lax.scan`` trajectory (``--seqlen`` steps),
with optional rematerialization (``--bptt-checkpoint-chunk``) to bound BPTT
memory.

Usage:
    python -m tcgan_tpu.run.bptt_wgan --datastore /tmp/run_bptt --seqlen 2000
"""

from __future__ import annotations

import sys

from tcgan_tpu.run.gan_common import make_gan_parser, run_gan


def make_parser():
    p = make_gan_parser(__doc__)
    p.add_argument("--bptt-checkpoint-chunk", type=int, default=0,
                   help="remat chunk size (0 = no checkpointing)")
    return p


def main(argv=None):
    args = make_parser().parse_args(argv)
    return run_gan(args, solver="bptt", conditional=False)


if __name__ == "__main__":
    sys.exit(main())
