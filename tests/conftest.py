"""Test harness config: run on CPU with 8 virtual devices.

Must run before the first `import jax` anywhere in the test session, so env
vars are set at conftest import time. Multi-chip sharding tests use the
8-device virtual CPU mesh (the driver separately dry-runs the multichip path
via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force the local CPU backend via the config API: in some sandboxes a TPU
# plugin outranks CPU and ignores the JAX_PLATFORMS env var, which would
# silently route every test dispatch through a device tunnel.
jax.config.update("jax_platforms", "cpu")

# Tests run in float64 (mirrors the reference's f64 CPU solver for parity
# checks; the production TPU path is f32/bf16). Explicit f32 arrays keep
# their dtype.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
