"""WGAN critic: dense MLP on tuning-curve vectors.

Reference parity: the Lasagne dense-MLP critic in
``tc_gan/networks/bptt_gan.py`` (SURVEY.md §2 "BPTT WGAN": layer-sizes flag,
default 128x128, rectified units). Implemented as an explicit parameter
pytree + pure apply function — no framework object state, so it composes
freely with jit/vmap/shard_map/custom_vjp and checkpoints as a plain pytree.

The optional input normalization (divide by a running/dataset mean TC,
recalled from the reference's ``normalization`` knob) is a static per-feature
scale baked at construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CriticConfig:
    in_dim: int
    layers: Tuple[int, ...] = (128, 128)
    activation: str = "relu"  # relu | tanh | gelu
    dtype: Any = jnp.float32
    # Optional static per-feature input scale (the reference's
    # normalization knob: divide TC inputs by the dataset's mean TC).
    input_scale: Tuple[float, ...] | None = None


def _act(name: str):
    return {"relu": jax.nn.relu, "tanh": jnp.tanh, "gelu": jax.nn.gelu}[name]


def init_params(cfg: CriticConfig, key: jax.Array) -> Dict[str, jnp.ndarray]:
    """He-init MLP params: layers + final scalar head."""
    dims = (cfg.in_dim,) + tuple(cfg.layers) + (1,)
    params = {}
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / din).astype(cfg.dtype)
        params[f"w{i}"] = scale * jax.random.normal(sub, (din, dout), dtype=cfg.dtype)
        params[f"b{i}"] = jnp.zeros((dout,), dtype=cfg.dtype)
    return params


def apply(
    cfg: CriticConfig,
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    input_scale: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Critic score, shape (..., ) for input (..., in_dim)."""
    if input_scale is None and cfg.input_scale is not None:
        input_scale = jnp.asarray(cfg.input_scale, dtype=x.dtype)
    h = x if input_scale is None else x * input_scale
    n_layers = len(cfg.layers)
    act = _act(cfg.activation)
    for i in range(n_layers):
        h = act(h @ params[f"w{i}"] + params[f"b{i}"])
    out = h @ params[f"w{n_layers}"] + params[f"b{n_layers}"]
    return out[..., 0]


def param_stats(params: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-layer L2 norms and maxima — the reference's critic-param stats
    recorder stream (SURVEY.md §2 "Recorders")."""
    out = {}
    for k, v in params.items():
        out[f"{k}.nnorm"] = jnp.linalg.norm(v.ravel())
        out[f"{k}.absmax"] = jnp.max(jnp.abs(v))
    return out
