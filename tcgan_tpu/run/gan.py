"""C2: WGAN-GP fit with fixed-point (implicit-diff) gradients.

Reference parity: ``tc_gan/run/gan.py`` (SURVEY.md §3.2) — forward solve by
the while-loop fixed-point solver, backward via the custom_vjp IFT rule.

Usage:
    python -m tcgan_tpu.run.gan --datastore /tmp/run_gan --n-steps 500
"""

from __future__ import annotations

import sys

from tcgan_tpu.run.gan_common import make_gan_parser, run_gan


def make_parser():
    return make_gan_parser(__doc__)


def main(argv=None):
    args = make_parser().parse_args(argv)
    return run_gan(args, solver="ift", conditional=False)


if __name__ == "__main__":
    sys.exit(main())
