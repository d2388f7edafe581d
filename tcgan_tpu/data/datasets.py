"""Tuning-curve datasets: file loading, fake-truth synthesis, minibatching.

Reference parity: the dataset helpers of SURVEY.md §2 "Data loading / truth
generation" — load real tuning curves from ``.npz``/``.mat``, or synthesize
a "fake truth" dataset by solving the SSN forward with known true
parameters (the parameter-recovery benchmark of the paper; also the test
fixture pattern, SURVEY.md §4: no external data needed).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcgan_tpu.models import generator as gen_lib
from tcgan_tpu.models.generator import GeneratorConfig


def load_tuning_curves(path: str | Path) -> np.ndarray:
    """Load a (num_samples, tc_dim) tuning-curve array from .npz/.npy/.mat.

    ``.npz`` uses key ``tuning_curves`` (fallback: first array). ``.mat``
    (MATLAB v5, the reference's data format) is read via scipy if available,
    else via a minimal reader error.
    """
    path = Path(path)
    if path.suffix == ".npy":
        return np.load(path)
    if path.suffix == ".npz":
        data = np.load(path)
        key = "tuning_curves" if "tuning_curves" in data.files else data.files[0]
        return data[key]
    if path.suffix == ".mat":
        try:
            from scipy.io import loadmat  # scipy may not be in the image
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                ".mat loading requires scipy; convert the dataset to .npz "
                "(key 'tuning_curves') instead"
            ) from e
        data = loadmat(path)
        arrays = {k: v for k, v in data.items() if not k.startswith("__")}
        # Named-key convention first (as for .npz); otherwise require the
        # file to be unambiguous — "first variable" would silently train
        # on whatever loadmat happened to yield first (e.g. a metadata
        # scalar next to the real TC matrix).
        for key in ("tuning_curves", "tc", "tc_data"):
            if key in arrays:
                return np.asarray(arrays[key])
        if len(arrays) == 1:
            return np.asarray(next(iter(arrays.values())))
        raise ValueError(
            f"{path} holds {sorted(arrays)} — name the tuning-curve "
            "variable 'tuning_curves' (or 'tc'), or export a single-"
            "variable file")
    raise ValueError(f"unsupported dataset format: {path.suffix}")


def generate_fake_truth(
    cfg: GeneratorConfig,
    true_J,
    true_D,
    true_S,
    num_samples: int,
    seed: int = 0,
    batch: int = 64,
    tries_factor: int = 4,
) -> np.ndarray:
    """Synthesize ground-truth tuning curves from known circuit parameters
    by solving SSN fixed points (forward only, no gradients).

    Returns (num_effective_samples, tc_dim) with unconverged/diverged
    samples dropped (matching the reference's rejection of bad solver
    samples when building datasets). The solve always uses the fixed-point
    path (the reference generated fake truth with ssnode fixed points,
    SURVEY.md §3.1) regardless of the training solver.
    """
    import dataclasses

    from tcgan_tpu.train.datastore import KnownError

    cfg = dataclasses.replace(cfg, solver="ift")
    params = gen_lib.init_params(cfg, true_J, true_D, true_S)
    key = jax.random.PRNGKey(seed)
    chunks = []
    n_done = 0
    forward = jax.jit(
        lambda k: gen_lib.sample_tuning_curves(cfg, params, k, batch),
    )
    spc = cfg.samples_per_circuit()
    tries = 0
    # tries_factor bounds the acceptable rejection rate: factor k aborts
    # below ~1/k per-circuit yield. Near-critical batteries (BASELINE.md
    # "battery design") legitimately run at 40-70% yield — raise the
    # factor (--truth-tries-factor) rather than abandoning the battery.
    max_tries = max(20, tries_factor * (num_samples // max(batch, 1) + 1))
    while n_done < num_samples:
        if tries >= max_tries:
            raise KnownError(
                f"fake-truth generation yielded {n_done}/{num_samples} "
                f"converged samples after {tries} batches — the 'true' "
                "circuit parameters are likely unstable or the solver "
                "budget (max_iter/atol) too tight"
            )
        tries += 1
        key, sub = jax.random.split(key)
        out = forward(sub)
        ok = np.asarray(out.converged.all(axis=-1))  # (batch,)
        tc = np.asarray(out.tc)
        if cfg.track_offset_identity:
            good = tc[ok]
        else:
            good = tc[np.repeat(ok, spc)]
        chunks.append(good)
        n_done += good.shape[0]
    return np.concatenate(chunks, axis=0)[:num_samples]


@dataclasses.dataclass
class TuningCurveDataset:
    """In-memory dataset with minibatch sampling on device.

    The full array is staged to device once; minibatch gathers happen
    on-device (no host->device transfer per step — SURVEY.md's HBM/transfer
    guidance).
    """

    tc: jnp.ndarray  # (num_samples, tc_dim)

    @classmethod
    def from_array(cls, arr, dtype=jnp.float32) -> "TuningCurveDataset":
        return cls(tc=jnp.asarray(arr, dtype=dtype))

    @property
    def num_samples(self) -> int:
        return self.tc.shape[0]

    @property
    def tc_dim(self) -> int:
        return self.tc.shape[1]

    def sample_stack(self, key: jax.Array, n_stacks: int, batch: int) -> jnp.ndarray:
        """(n_stacks, batch, tc_dim) random minibatches (with replacement)."""
        idx = jax.random.randint(
            key, (n_stacks, batch), minval=0, maxval=self.num_samples
        )
        return self.tc[idx]

    def moments(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from tcgan_tpu.models.moments import data_moments

        return data_moments(self.tc)
