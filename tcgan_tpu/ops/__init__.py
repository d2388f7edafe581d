"""Numeric core: SSN io functions, weight builder, stimulus battery, solvers.

Unifies the reference's L1 (NumPy ``tc_gan/ssnode.py``) and L2 (Theano
``tc_gan/gradient_expressions/``) layers — in JAX one differentiable
implementation serves both roles.
"""
