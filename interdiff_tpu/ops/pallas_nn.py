"""Pallas TPU kernel for brute-force nearest-neighbour queries — the hot op
behind `point2point_signed` (6890 SMPL verts x 2048 object points per frame,
batched over T*B; SURVEY.md §2.2 'chamfer_distance').

Formulation: for the argmin over b of |a-b|^2 the |a|^2 term is constant per
query row, so the kernel computes ``min_j (|b_j|^2 - 2 a.b_j)`` — one
batched [TA, 3] x [3, M] matmul on the MXU per tile plus a VPU min/argmin —
and adds |a|^2 back at the end.  The [N, M] distance matrix never leaves
VMEM.

TPU lowering constraints shape the blocks: output blocks must be (8k, 128k)
tiles, so the grid processes 8 batch rows x TILE_A queries per step
(VMEM per step ~ 8 * TILE_A * M * 4B = 8 MB at 128 x 2048).  Batch is
padded to a multiple of 8 and queries to TILE_A in the wrapper.

Falls back to the chunked XLA path on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 8  # batch rows per block (sublane tiling requirement)


def _nn_kernel(a_ref, b_ref, dist_ref, idx_ref):
    a = a_ref[...]  # [BB, TA, 3]
    b = b_ref[...]  # [BB, M, 3]
    # scores[r, i, j] = |b_rj|^2 - 2 a_ri . b_rj  (|a|^2 added by the wrapper)
    b2 = jnp.sum(b * b, axis=-1)  # [BB, M]
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)  # [BB, TA, M]
    scores = b2[:, None, :] - 2.0 * ab
    dist_ref[...] = jnp.min(scores, axis=-1)
    idx_ref[...] = jnp.argmin(scores, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile_a", "interpret"))
def nearest_neighbor_pallas(a: jax.Array, b: jax.Array, *,
                            tile_a: int = 128,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """a: [B, N, 3], b: [B, M, 3] -> (sq_dist [B, N], idx [B, N] int32)."""
    B, N, _ = a.shape
    M = b.shape[1]
    b_pad = (-B) % _BB
    n_pad = (-N) % tile_a
    if b_pad or n_pad:
        a_padded = jnp.pad(a, ((0, b_pad), (0, n_pad), (0, 0)))
    else:
        a_padded = a
    if b_pad:
        b_padded = jnp.pad(b, ((0, b_pad), (0, 0), (0, 0)))
    else:
        b_padded = b
    Bp, Np = B + b_pad, N + n_pad

    grid = (Bp // _BB, Np // tile_a)
    dist_part, idx = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BB, tile_a, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, M, 3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BB, tile_a), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, tile_a), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.int32),
        ],
        interpret=interpret,
    )(a_padded, b_padded)

    a2 = jnp.sum(a * a, axis=-1)
    dist = jnp.maximum(dist_part[:B, :N] + a2, 0.0)
    return dist, idx[:B, :N]


def on_tpu() -> bool:
    """True on a directly-attached TPU. The 'axon' tunnel platform is
    excluded: its remote-compile path for Mosaic/Pallas kernels stalls
    (>30 min, observed), while the chunked-XLA fallback compiles and runs
    fast there; set use_pallas=True explicitly to force the kernel."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
