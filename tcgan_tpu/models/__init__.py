"""Model layer: generator/critic assemblies — WGAN-GP (implicit-diff and
BPTT), conditional WGAN, moment matching.

Reference parity: ``tc_gan/networks/`` (SURVEY.md §1 L3).
"""
