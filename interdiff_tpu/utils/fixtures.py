"""Synthetic tiny-model fixtures shared by the test suite and the driver's
multi-chip dry run (`__graft_entry__.dryrun_multichip`).

Real SMPL-H pkls aren't shipped in this image (see README "Data reality"),
so structure-exercising paths — the correction-in-scan sampler, FK, signed
distances — run against a small synthetic `SmplModel` with the same tree
shape as SMPL-H (52 joints, 156-dim poses)."""

from __future__ import annotations

import numpy as np

from interdiff_tpu.smpl.model import SmplModel


def tiny_smpl_model(rng: np.random.Generator, V: int = 64,
                    J: int = 22 + 30) -> SmplModel:
    """Synthetic SMPL-H-shaped model (52 joints so 156-dim poses work):
    binary-tree kinematic topology, random-but-small shape dirs, uniform
    skinning weights.  Deterministic given ``rng``."""
    parents = np.zeros(J, dtype=np.int64)
    for j in range(1, J):
        parents[j] = (j - 1) // 2  # binary-tree topology
    return SmplModel.create(
        v_template=rng.standard_normal((V, 3)) * 0.2,
        shapedirs=rng.standard_normal((V, 3, 10)) * 0.01,
        posedirs=rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001,
        j_regressor=np.abs(rng.random((J, V)))
        / np.abs(rng.random((J, V))).sum(1, keepdims=True),
        weights=np.eye(V, J) * 0 + 1.0 / J,
        parents=parents,
        faces=np.array([[0, 1, 2], [1, 2, 3], [2, 3, 4]], dtype=np.int32),
    )
