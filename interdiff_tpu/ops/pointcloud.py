"""Point-cloud set-abstraction ops (furthest-point sampling, ball query,
grouping) as pure jnp — the TPU replacement for the `pointnet2_ops` CUDA
kernels reached from `interdiff/model/layers.py:111-175`.

TPU-native design: the reference's CUDA kernels are scatter/gather programs;
here everything is dense masked linear algebra that XLA tiles onto the MXU.
Problem sizes are tiny (P=2048 points, npoint<=1024, nsample<=32), so the
O(N*M) pairwise-distance matrix (4M f32 max) lives comfortably in VMEM and a
brute-force formulation beats any clever indexing.

Semantics pinned to the pointnet2_ops kernels:

  * ``furthest_point_sample`` starts from point 0 and greedily adds the point
    maximising the min-distance to the selected set (ties -> lowest index,
    matching the CUDA reduction order for exact parity is not required: the
    selected *set* is what downstream consumes).
  * ``ball_query`` returns the **first** ``nsample`` point indices (in
    original order) within ``radius`` of each center; rows with fewer hits
    are padded by repeating the first hit (the CUDA kernel pre-fills the row
    with the first in-radius index); rows with zero hits return index 0.
  * grouping re-centers xyz around the query center and (``use_xyz``)
    concatenates the re-centered xyz *before* the point features.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances. a: [..., N, 3], b: [..., M, 3] -> [..., N, M]."""
    # (a-b)^2 = |a|^2 + |b|^2 - 2ab ; the matmul form runs on the MXU.
    aa = jnp.sum(a * a, axis=-1)[..., :, None]
    bb = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.einsum("...nd,...md->...nm", a, b)
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnums=(1,))
def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Greedy FPS. xyz: [B, N, 3] -> int32 indices [B, npoint].

    Matches `pointnet2_ops.furthest_point_sample`: seed index 0, then
    iteratively pick argmax of running min-distance to the chosen set.
    """
    B, N, _ = xyz.shape

    def body(carry, _):
        min_d, last = carry
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # [B,1,3]
        d = jnp.sum((xyz - last_xyz) ** 2, axis=-1)  # [B, N]
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)
        return (min_d, nxt), last

    init = (jnp.full((B, N), jnp.inf, dtype=xyz.dtype),
            jnp.zeros((B,), dtype=jnp.int32))
    # unroll: the body is tiny ([B,N] elementwise + argmax) and inherently
    # serial — per-iteration scan overhead dominates on TPU, so unrolling
    # several iterations per scan step is a large latency win
    (_, _), idx = jax.lax.scan(body, init, None, length=npoint, unroll=8)
    return idx.T  # [B, npoint]


@functools.partial(jax.jit, static_argnums=(1, 2))
def hierarchical_fps(xyz: jax.Array, npoint: int, groups: int) -> jax.Array:
    """Grouped FPS — the TPU-first refactor of the inherently serial
    furthest-point-sampling chain.

    Exact FPS needs ``npoint`` *dependent* argmax rounds (the reference CUDA
    kernel hides this in a fused kernel; on TPU the 1024-step chain costs
    ~100 ms and dominates the whole 100-step sampler — measured in
    perf_probe).  Here the cloud is split into ``groups`` strided partitions
    (surface-sample order is unstructured, so striding is a uniform random
    split) and exact FPS runs *inside each partition in parallel*:
    sequential depth drops groups-fold while the selected set keeps
    FPS-grade spatial coverage.  No pretrained weights depend on the exact
    CUDA selection (the reference diffusion checkpoints were never shipped),
    so this is the default for our models; ``furthest_point_sample`` remains
    for exact-semantics use.

    xyz: [B, N, 3] with N % groups == 0 and npoint % groups == 0.
    Returns int32 indices [B, npoint] (into the original N ordering).
    """
    B, N, _ = xyz.shape
    assert N % groups == 0 and npoint % groups == 0
    per = N // groups
    k = npoint // groups
    # strided partition: group g takes points [g::groups]
    grouped = xyz.reshape(B, per, groups, 3).transpose(0, 2, 1, 3)
    flat = grouped.reshape(B * groups, per, 3)
    sub_idx = furthest_point_sample(flat, k)  # [B*G, k] indices into group
    sub_idx = sub_idx.reshape(B, groups, k)
    # map back: element j of group g sits at original index j*groups + g
    orig = sub_idx * groups + jnp.arange(groups, dtype=jnp.int32)[None, :, None]
    return orig.reshape(B, npoint)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points: [B, N, C], idx: int [B, ...] -> [B, ..., C]."""
    B = points.shape[0]
    batch = jnp.arange(B).reshape((B,) + (1,) * (idx.ndim - 1))
    return points[batch, idx]


@functools.partial(jax.jit, static_argnums=(3,))
def ball_query(xyz: jax.Array, new_xyz: jax.Array, radius: float,
               nsample: int, d2: Optional[jax.Array] = None) -> jax.Array:
    """First-`nsample`-within-radius neighbour indices.

    xyz: [B, N, 3] points, new_xyz: [B, M, 3] centers -> int32 [B, M, nsample].
    ``d2``: optional precomputed ``pairwise_sqdist(new_xyz, xyz)`` — the MSG
    modules query several radii against the same (centers, points) pair, and
    the [B, M, N] distance matrix is the dominant HBM tenant of the op
    (134 MB at B=32, M=N=1024), so computing it once is a straight
    bandwidth win.
    """
    B, N, _ = xyz.shape
    if d2 is None:
        d2 = pairwise_sqdist(new_xyz, xyz)  # [B, M, N]
    mask = d2 < radius * radius
    # Select the first nsample True positions in ascending j order:
    # score favours masked entries, then low index.
    j = jnp.arange(N, dtype=jnp.float32)
    score = jnp.where(mask, -j, -jnp.inf)
    _, idx = jax.lax.top_k(score, nsample)  # ascending j among masked
    idx = idx.astype(jnp.int32)
    cnt = jnp.sum(mask, axis=-1, keepdims=True)  # [B, M, 1]
    first = idx[..., :1]
    valid = jnp.arange(nsample) < cnt
    idx = jnp.where(valid, idx, first)
    # zero-hit rows: CUDA kernel leaves zeros
    return jnp.where(cnt > 0, idx, 0)


def query_and_group(xyz: jax.Array, new_xyz: jax.Array,
                    features: Optional[jax.Array], radius: float,
                    nsample: int, *, use_xyz: bool = True,
                    d2: Optional[jax.Array] = None) -> jax.Array:
    """`QueryAndGroup` equivalent, channels-last.

    xyz: [B, N, 3]; new_xyz: [B, M, 3]; features: [B, N, C] or None.
    Returns [B, M, nsample, 3+C] (re-centered xyz first, as in pointnet2_ops).
    ``d2``: optional precomputed distances, see :func:`ball_query`.
    """
    from interdiff_tpu.ops.pallas_gather import gather_rows

    idx = ball_query(xyz, new_xyz, radius, nsample, d2)  # [B, M, S]
    B, M, S = idx.shape
    # one fused row-gather over concat(xyz, features): on TPU this rides
    # the Pallas masked-reduction kernel (pallas_gather.py) — the XLA
    # per-row gather was the dominant cost of the whole SA stage
    data = (xyz if features is None
            else jnp.concatenate([xyz, features], axis=-1))
    g = gather_rows(data, idx.reshape(B, M * S)).reshape(B, M, S, -1)
    grouped_xyz = g[..., :3] - new_xyz[:, :, None, :]
    parts = []
    if use_xyz:
        parts.append(grouped_xyz)
    if features is not None:
        parts.append(g[..., 3:])
    return jnp.concatenate(parts, axis=-1)
