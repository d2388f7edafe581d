"""CLI entry points, one per experiment type.

Reference parity: ``tc_gan/run/`` (SURVEY.md §1 L5): invoked as
``python -m tcgan_tpu.run.<name>``; each module exposes ``make_parser()``
and ``main(argv=None)``.

Entry points (mapped to [BASELINE] configs C1-C5):

- ``forward``    — C1: forward-only SSN solve + bandwidth tuning-curve sweep
- ``gan``        — C2: WGAN-GP with fixed-point (implicit-diff) gradients
- ``bptt_wgan``  — C3: WGAN-GP with BPTT (truncated scan) gradients
- ``bptt_cwgan`` — C4: conditional WGAN over contrast x bandwidth
- ``moments``    — C5: moment-matching fit (``--parallel mesh`` for
                   sample-parallel multi-chip execution)
"""
