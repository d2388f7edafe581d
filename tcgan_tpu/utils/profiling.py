"""Profiler integration (SURVEY.md §5.1 upgrade).

The reference only had wall-clock StopWatch columns; here we add optional
`jax.profiler` traces: pass ``--profile-dir`` to any CLI (or use
:func:`maybe_trace` programmatically) to capture device traces viewable in
TensorBoard / Perfetto.
"""

from __future__ import annotations

from contextlib import contextmanager, nullcontext


@contextmanager
def trace(profile_dir: str):
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def maybe_trace(profile_dir: str | None):
    """Context manager: a jax profiler trace when a dir is given, else a
    no-op."""
    return trace(profile_dir) if profile_dir else nullcontext()
