"""Pallas TPU kernel for brute-force nearest-neighbour queries — the hot op
behind `point2point_signed` (6890 SMPL verts x 2048 object points per frame,
batched over T*B; SURVEY.md §2.2 'chamfer_distance').

Formulation: for the argmin over b of |a-b|^2 the |a|^2 term is constant per
query row, so the kernel computes ``min_j (|b_j|^2 - 2 a.b_j)`` — one
[TA, 3] x [3, M] matmul on the MXU per tile plus a VPU min/argmin — and adds
|a|^2 back at the end.  The [N, M] distance matrix never leaves VMEM.

Grid: (batch, N / TILE_A).  VMEM per step ~ TILE_A * M * 4B (4 MB at
512 x 2048).  Falls back to the chunked XLA path on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nn_kernel(a_ref, b_ref, dist_ref, idx_ref):
    a = a_ref[0]  # [TA, 3]
    b = b_ref[0]  # [M, 3]
    # scores[i, j] = |b_j|^2 - 2 a_i . b_j   (|a_i|^2 added by the wrapper)
    b2 = jnp.sum(b * b, axis=-1)  # [M]
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [TA, M] exact f32
    scores = b2[None, :] - 2.0 * ab
    dist_ref[0] = jnp.min(scores, axis=-1)
    idx_ref[0] = jnp.argmin(scores, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_a", "interpret"))
def nearest_neighbor_pallas(a: jax.Array, b: jax.Array, *,
                            tile_a: int = 512,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """a: [B, N, 3], b: [B, M, 3] -> (sq_dist [B, N], idx [B, N] int32)."""
    B, N, _ = a.shape
    M = b.shape[1]
    n_pad = (-N) % tile_a
    a_padded = jnp.pad(a, ((0, 0), (0, n_pad), (0, 0))) if n_pad else a
    Np = N + n_pad

    grid = (B, Np // tile_a)
    dist_part, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_a, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_a), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_a), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, Np), jnp.int32),
        ],
        interpret=interpret,
    )(a_padded, b)

    a2 = jnp.sum(a * a, axis=-1)
    dist = jnp.maximum(dist_part[:, :N] + a2, 0.0)
    return dist, idx[:, :N]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
