"""Orbax checkpointing of the full training state.

Reference parity + upgrade: the reference only dumped per-step generator
params to CSV and critic params to ``.npz`` (SURVEY.md §5.4, no optimizer
state, no automatic resume). Here the WHOLE state pytree — generator params,
critic params, both optimizer states, step counter — checkpoints atomically
via orbax, and ``restore`` resumes training exactly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

try:  # orbax is in the image; guard anyway so the core library can load without it
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


class CheckpointManager:
    """Thin wrapper: ``save(step, state)`` / ``restore(state_like)``."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        if _HAVE_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:  # pragma: no cover
            self._mgr = None

    def save(self, step: int, state: Any):
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(state))
            self._mgr.wait_until_finished()
        else:  # pragma: no cover - numpy fallback
            flat, _ = jax.tree_util.tree_flatten(state)
            np.savez(self.directory / f"ckpt_{step}.npz",
                     *[np.asarray(x) for x in flat])

    def latest_step(self) -> int | None:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = sorted(
            int(p.stem.split("_")[1]) for p in self.directory.glob("ckpt_*.npz")
        )  # pragma: no cover
        return steps[-1] if steps else None  # pragma: no cover

    def restore(self, state_like: Any, step: int | None = None) -> Any:
        """Restore into the structure of ``state_like`` (an abstract or
        concrete state pytree)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if self._mgr is not None:
            try:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(state_like)
                )
            except ValueError as e:
                raise ValueError(
                    f"checkpoint {step} under {self.directory} does not "
                    "match the current TrainState structure — checkpoints "
                    "written before an optimizer/state schema change (e.g. "
                    "the apply_if_finite wrapper or ema_params field) "
                    "cannot be resumed; restart the run or re-init from "
                    "generator.csv/disc_params.npz"
                ) from e
        flat, treedef = jax.tree_util.tree_flatten(state_like)  # pragma: no cover
        data = np.load(self.directory / f"ckpt_{step}.npz")  # pragma: no cover
        return jax.tree_util.tree_unflatten(  # pragma: no cover
            treedef, [data[k] for k in data.files])

    def close(self):
        if self._mgr is not None:
            self._mgr.close()
