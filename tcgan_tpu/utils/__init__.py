"""Shared utilities (timing, pytree helpers)."""
