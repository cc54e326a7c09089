"""Mesh construction + sharding helpers.

The reference has no distributed path at all (SURVEY.md §2.3: `gpus=1`
everywhere, one dead `torch.distributed.all_gather`).  For these model
sizes (0.1-10 M params) the right TPU decomposition is pure data
parallelism: parameters replicated, batch sharded over the mesh's ``data``
axis, gradient psum over ICI inserted by XLA under jit.  A ``model`` axis
is still exposed for experiments (e.g. sharding the 2048-point cloud or
the diverse-samples dimension), but the default mesh is 1-D.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(*, data: Optional[int] = None, model: int = 1,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a [data, model] mesh over the available devices.

    With ``model=1`` (default) this is the 1-D data-parallel mesh used by
    all trainers; ``data=None`` uses every device.
    """
    devices = np.asarray(jax.devices())
    if data is None:
        data = len(devices) // model
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, *, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, *, axis: str = "data"):
    """Place every array in a batch pytree with its leading dim sharded."""
    sharding = batch_sharding(mesh, axis=axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
