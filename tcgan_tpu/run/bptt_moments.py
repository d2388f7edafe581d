"""Alias entry point matching the reference's ``tc_gan.run.bptt_moments``
name (SURVEY.md §3.5). Identical to ``tcgan_tpu.run.moments`` with the BPTT
solver as the default gradient path.
"""

from __future__ import annotations

import sys

from tcgan_tpu.run.moments import main as _main
from tcgan_tpu.run.moments import make_parser  # noqa: F401


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--solver" not in argv:
        argv = ["--solver", "bptt"] + argv
    return _main(argv)


if __name__ == "__main__":
    sys.exit(main())
