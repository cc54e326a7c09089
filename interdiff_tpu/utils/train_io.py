"""Checkpoint/resume + metrics logging.

Replaces the reference's Lightning `ModelCheckpoint(monitor='val_loss',
save_weights_only=True, save_last=True)` + TensorBoardLogger
(`train_diffusion_smpl.py:632-637`) with orbax checkpoints and a JSONL
metrics stream (plus per-term scalars, matching the reference's `self.log`
of every loss term and per-timestep-quartile diagnostics).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


class CheckpointManager:
    """Best + last checkpointing via orbax (weights-only, like the ref)."""

    def __init__(self, directory: str, *, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, best_fn=lambda m: m["val_loss"],
                best_mode="min"),
        )
        self._best = float("inf")

    def save(self, step: int, state: Any, *,
             val_loss: Optional[float] = None) -> None:
        import orbax.checkpoint as ocp

        metrics = {"val_loss": float(val_loss)
                   if val_loss is not None else float("inf")}
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)

    def restore(self, step: Optional[int], template: Any) -> Any:
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step() if step is None else step
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()


class MetricsLogger:
    """JSONL metrics stream; one line per log call."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], **extra) -> None:
        row = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        for k, v in {**metrics, **extra}.items():
            if isinstance(v, (str, bool)):
                row[k] = v
                continue
            v = np.asarray(v)
            row[k] = float(v) if v.ndim == 0 else v.tolist()
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def quartile_metrics(t: jax.Array, per_sample_loss: jax.Array,
                     num_timesteps: int) -> Dict[str, jax.Array]:
    """Per-diffusion-timestep-quartile loss logging
    (`train_diffusion_smpl.py:168-175`)."""
    import jax.numpy as jnp

    quartile = (4 * t) // num_timesteps
    out = {}
    for q in range(4):
        mask = (quartile == q).astype(jnp.float32)
        out[f"q{q}"] = (jnp.sum(per_sample_loss * mask)
                        / jnp.maximum(jnp.sum(mask), 1.0))
    return out
