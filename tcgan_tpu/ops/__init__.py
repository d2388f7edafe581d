"""Numeric core: SSN io functions, weight builder, stimulus battery, solvers.

Unifies the reference's L1 (NumPy ``tc_gan/ssnode.py``) and L2 (Theano
``tc_gan/gradient_expressions/``) layers — in JAX one differentiable
implementation serves both roles.

Reference-parity aliases (``tc_gan/ssnode.py`` names) are exported here so
users of the reference find the familiar entry points:
``find_fixed_points`` (= solve_fixed_point), ``solve_dynamics``,
``make_io_fun``, ``rate_to_volt``.
"""

from tcgan_tpu.ops.euler import solve_dynamics  # noqa: F401
from tcgan_tpu.ops.fixed_point import (  # noqa: F401
    FixedPointResult,
    solve_any,
    solve_fixed_point,
)
from tcgan_tpu.ops.io_funs import make_io_fun, rate_to_volt  # noqa: F401
from tcgan_tpu.ops.ssn import SSNConfig  # noqa: F401

# the reference's name for the batched fixed-point driver
find_fixed_points = solve_fixed_point
