"""Fused ball-query + group Pallas TPU kernel — the PointNet++ set-
abstraction hot path (`pointnet2_ops` `ball_query` + `group_points`,
reached from `interdiff/model/layers.py:118-139`).

The XLA pipeline in `ops/pointcloud.query_and_group` is three passes over
[B, M, N]-sized tensors per radius scale:

    score = where(d2 < r^2, -j, -inf)     (134 MB materialised at B=32,
    idx   = top_k(score, S)                M=N=1024)
    out   = gather_rows(data, idx)        (Pallas select-sum, ~2-4 ms)

`top_k` is the hog: TPU lowers it to a partial sort over the N lane axis
(~7-8 ms per scale on v5e, chip profile 2026-08-20) only to recover *rank
order* that a prefix sum already encodes: the CUDA kernel's "first
``nsample`` points within radius, in index order" means point ``n`` fills
slot ``s`` of query ``m`` iff

    mask[m, n]  and  cumsum_n(mask)[m, n] == s + 1.

So the selection IS a rank compare, and the gather collapses into the same
exact masked select-sum the `pallas_gather` kernel already uses (one
nonzero term per sum -> no rounding):

    out[c, s, m] = sum_n (rank[n, m] == s + 1) * data[n, c].

XLA keeps only the MXU-bound pairwise-d2 matmul (shared across radius
scales); the in-radius mask, the [N, M] prefix-rank cumsum and the
sentinel-where all happen in VMEM scratch (computed once per query tile at
grid slot 0), and the kernel replaces top_k + gather with S
compare-select-sum passes — the top_k, its materialised score tensor, and
the ~4 extra [B, N, M] HBM tensors of the XLA rank pipeline are all
deleted.  Grouped outputs are BIT-IDENTICAL to the XLA path (same
selection, same single-term sums, same recenter subtraction order; the
f32 cumsum of a boolean mask is exact small-integer arithmetic).

Layout notes (same lessons as `pallas_gather.py` / `pallas_nn.py`):

* rank arrives TRANSPOSED [N, TM] (candidates on sublanes, queries on
  lanes) so each select-sum is a cheap sublane (axis=0) reduction landing
  lane-major;
* the slot index is a GRID axis (one [N, TM] mask live at a time — an
  unrolled S-loop kept all S masks on the Mosaic stack and OOMed scoped
  vmem); the output block [1, C', TM] keeps the 128-multiple query tile
  minor, callers transpose back (bandwidth-trivial);
* the C' loop is unrolled: 2D ops only, no dynamic stores.

Short rows (fewer than ``nsample`` hits repeat the first hit) and zero-hit
rows (CUDA leaves index 0) are fixed up in XLA from the per-query hit
count — elementwise on the [B, M, S, C'] output, bytes-trivial.

The op needs no VJP in our graphs: stage-1 grouping consumes raw data
(xyz / input features carry no parameter dependency), and stage-2 (whose
features DO need gradients) stays on the XLA path (M=1, kernel-unworthy).
A custom VJP is installed anyway — backward falls back to the XLA
reference implementation's vjp — so the op stays safe under jax.grad.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from interdiff_tpu.ops.pallas_nn import on_tpu

_BIG = 2.0 ** 30  # rank sentinel for out-of-radius candidates
_MAX_C = 8  # same kernel-worthiness bound as pallas_gather

_FORCE_PALLAS_INTERPRET = False  # tests flip this to run the kernel off-TPU


def _group_scoped_bytes(n: int, tile_m: int) -> int:
    """Conservative scoped-vmem estimate for one grid step of the
    rank-select kernel: the d2t block, the rank scratch and the prefix-scan
    stack temporaries are all [N, tile_m] f32.  Chip calibration
    (2026-08-20 gate run): 16.04 MB observed at N=2048, tile 512 — a
    40 KB-over-limit OOM — i.e. 4.01 f32 words per N*tile_m element; we
    charge 5, same as the fused-SA model (observed 4.42 there)."""
    return 20 * n * tile_m


def _pick_group_tile_m(n: int):
    from interdiff_tpu.ops.pallas_sa import pick_tile_m

    return pick_tile_m(n, _group_scoped_bytes)


def _prefix_sum_rows(x):
    """Inclusive prefix sum along axis 0 as a Hillis-Steele shift-add scan
    (log2 N concat+add passes).  Mosaic has no `cumsum` lowering
    (NotImplementedError, observed on-chip 2026-08-20); for the 0/1
    in-radius masks this is EXACT — integer-valued f32 sums are associative
    below 2^24 — so results stay bit-identical to XLA's cumsum."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = x + jnp.concatenate(
            [jnp.zeros((k,) + x.shape[1:], x.dtype), x[:-k]], axis=0)
        k *= 2
    return x


def _make_group_kernel(r2: float):
    """Kernel closure over the (static) squared radius.

    Blocks: d2t (1, N, TM) f32; data (1, N, C) f32; outs: grouped
    (1, 1, C, TM) + cnt (1, 1, TM); scratch: rank (N, TM) f32.

    One grid step = one slot s (grid axis 2): a single [N, TM] mask is live
    at a time (an unrolled S-loop kept all S masks on the Mosaic stack —
    38 MB at S=16, TM=512 — and OOMed scoped vmem).  The d2t/data blocks
    are index-invariant along s, so Mosaic keeps them resident, and the
    rank matrix is computed ONCE per (b, m-tile) at s == 0 into VMEM
    scratch — the mask/cumsum/where pipeline never touches HBM (the XLA
    formulation materialized ~4 extra [B, N, M] tensors per radius scale,
    ~0.8 GB of HBM round-trips per MSG module at B=32, M=N=1024)."""

    def kernel(d2t_ref, data_ref, out_ref, cnt_ref, rank_ref):
        _, N, C = data_ref.shape
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _():
            mask = d2t_ref[0] < r2  # [N, TM]
            rank = _prefix_sum_rows(mask.astype(jnp.float32))
            cnt_ref[0, 0, :] = rank[N - 1, :]
            rank_ref[...] = jnp.where(mask, rank, _BIG)

        m = rank_ref[...] == (s + 1).astype(jnp.float32)
        for c in range(C):
            col = data_ref[0, :, c : c + 1]  # [N, 1]
            out_ref[0, 0, c, :] = jnp.sum(jnp.where(m, col, 0.0), axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("r2", "nsample", "tile_m", "interpret"))
def _select_sum_pallas(d2t: jax.Array, data: jax.Array, r2: float,
                       nsample: int, *, tile_m: int = 512,
                       interpret: bool = False):
    """d2t: [B, N, M] f32 squared distances, data: [B, N, C] f32 ->
    (gathered [B, M, S, C], cnt [B, M]): slot s of query m = the candidate
    with in-radius prefix-rank s+1 (empty slots are 0), cnt = hits per
    query.  The in-radius mask, prefix-rank cumsum and sentinel-where all
    happen in VMEM."""
    B, N, M = d2t.shape
    C = data.shape[-1]
    m_pad = (-M) % tile_m
    if m_pad:
        d2t = jnp.pad(d2t, ((0, 0), (0, 0), (0, m_pad)),
                      constant_values=jnp.inf)
    Mp = M + m_pad
    out, cnt = pl.pallas_call(
        _make_group_kernel(r2),
        grid=(B, Mp // tile_m, nsample),
        in_specs=[
            pl.BlockSpec((1, N, tile_m), lambda b, m, s: (b, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, m, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, C, tile_m), lambda b, m, s: (b, s, 0, m),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_m), lambda b, m, s: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nsample, C, Mp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Mp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((N, tile_m), jnp.float32)],
        interpret=interpret,
    )(d2t, data.astype(jnp.float32))
    return out.transpose(0, 3, 1, 2)[:, :M], cnt[:, 0, :M]


def _reference_group(xyz, new_xyz, features, radius, nsample, use_xyz,
                     d2=None):
    from interdiff_tpu.ops.pointcloud import query_and_group

    return query_and_group(xyz, new_xyz, features, radius, nsample,
                           use_xyz=use_xyz, d2=d2)


def _fused_impl(xyz, new_xyz, features, radius, nsample, use_xyz, d2t):
    data = (xyz if features is None
            else jnp.concatenate([xyz, features], axis=-1))
    C = data.shape[-1]
    # tile_m is shape-aware (scoped-vmem scales with N*tile_m); None means
    # no tile fits -> structural fallback to the XLA path, never a
    # compile-crash of the embedding graph.
    tile_m = _pick_group_tile_m(xyz.shape[1])
    use_kernel = (C <= _MAX_C and data.dtype == jnp.float32
                  and tile_m is not None
                  and (on_tpu() or _FORCE_PALLAS_INTERPRET))
    if not use_kernel:
        return _reference_group(xyz, new_xyz, features, radius, nsample,
                                use_xyz,
                                None if d2t is None
                                else jnp.swapaxes(d2t, 1, 2))

    if d2t is None:
        d2t = pairwise_sqdist_t(xyz, new_xyz)  # [B, N, M]
    g, cnt = _select_sum_pallas(d2t, data, float(radius) * float(radius),
                                nsample, tile_m=tile_m,
                                interpret=_FORCE_PALLAS_INTERPRET)

    # CUDA ball_query row semantics: short rows repeat the FIRST hit,
    # zero-hit rows take index 0 (`pointnet2_ops` kernel; see
    # ops/pointcloud.ball_query).  Elementwise on the small output.
    first = jnp.where(cnt[..., None, None] > 0, g[:, :, :1],
                      data[:, :1, None, :])  # [B, M, 1, C]
    valid = (jnp.arange(nsample) < cnt[..., None])[..., None]
    g = jnp.where(valid, g, first)

    parts = []
    if use_xyz:
        parts.append(g[..., :3] - new_xyz[:, :, None, :])
    if features is not None:
        parts.append(g[..., 3:])
    elif not use_xyz:
        raise ValueError("features=None requires use_xyz=True")
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def pairwise_sqdist_t(xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """Transposed pairwise squared distances [B, N, M] (candidates on the
    second axis — the layout the select-sum kernel streams).  One matrix is
    shared across every radius scale of an MSG module."""
    from interdiff_tpu.ops.pointcloud import pairwise_sqdist

    return pairwise_sqdist(xyz, new_xyz)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_query_group(xyz: jax.Array, new_xyz: jax.Array,
                      features: Optional[jax.Array], radius: float,
                      nsample: int, use_xyz: bool = True,
                      d2t: Optional[jax.Array] = None) -> jax.Array:
    """`QueryAndGroup` with the fused rank-select kernel on TPU.

    xyz: [B, N, 3]; new_xyz: [B, M, 3]; features: [B, N, C] | None;
    ``d2t``: optional precomputed :func:`pairwise_sqdist_t` (shared across
    MSG scales).  Returns [B, M, nsample, 3+C] — bit-identical to
    `ops/pointcloud.query_and_group`.
    """
    return _fused_impl(xyz, new_xyz, features, radius, nsample, use_xyz, d2t)


def _fqg_fwd(xyz, new_xyz, features, radius, nsample, use_xyz, d2t=None):
    out = _fused_impl(xyz, new_xyz, features, radius, nsample, use_xyz, d2t)
    return out, (xyz, new_xyz, features, None if d2t is None else d2t)


def _fqg_bwd(radius, nsample, use_xyz, res, g):
    # The fused kernel has no TPU backward (our graphs never differentiate
    # stage-1 grouping); correctness under jax.grad falls back to the XLA
    # reference implementation's vjp.  d2t only drives the (piecewise-
    # constant) selection — zero cotangent, like the reference's idx.
    xyz, new_xyz, features, d2t = res
    g_d2t = None if d2t is None else jnp.zeros_like(d2t)
    # Replay the grouping on the FORWARD's distance bits: when the forward
    # selected on a shared d2t, recomputing pairwise_sqdist(new_xyz, xyz)
    # here (opposite matmul orientation, default precision) can flip
    # borderline in-radius selections and scatter cotangents to a different
    # neighbour set (advisor r4; commit af3a749 documents the flip class).
    d2 = None if d2t is None else jnp.swapaxes(d2t, 1, 2)
    if features is None:
        ref = lambda x, nx: _reference_group(  # noqa: E731
            x, nx, None, radius, nsample, use_xyz, d2)
        _, vjp = jax.vjp(ref, xyz, new_xyz)
        gx, gn = vjp(g)
        return gx, gn, None, g_d2t
    ref = lambda x, nx, f: _reference_group(  # noqa: E731
        x, nx, f, radius, nsample, use_xyz, d2)
    _, vjp = jax.vjp(ref, xyz, new_xyz, features)
    gx, gn, gf = vjp(g)
    return gx, gn, gf, g_d2t


fused_query_group.defvjp(_fqg_fwd, _fqg_bwd)
