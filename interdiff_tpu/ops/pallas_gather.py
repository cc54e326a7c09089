"""Pallas TPU kernel for batched row-gathers — the hot op inside
`query_and_group` (PointNet++ set abstraction, SURVEY.md §2.2
'pointnet2_ops'; reference CUDA kernels `group_points` /
`gather_points`, `interdiff/model/layers.py:111-175`).

XLA lowers a [B, K] x [B, N, C] row-gather with tiny C to per-row
dynamic-slice loops: measured 22-34 ms per `query_and_group` scale at the
train shape (B=32, M=N=1024, ns=16/32, C=4) on v5e — the single largest
tenant of the SMPL train step (scripts/profile_pointnet_parts.py).  A
gather has no MXU/VPU form in XLA, but with N small (<= a few thousand
points) the selection can be written as a dense masked reduction that the
VPU eats:

    out[k, c] = sum_n 1[idx_k == n] * data[n, c]

The [N, TK] mask tile lives only in VMEM.  Layout notes (same lessons as
`pallas_nn.py`):

* the mask is built TRANSPOSED ([N, TK]: candidate rows on sublanes,
  queries on lanes) so the per-channel reduction is a cheap sublane
  (axis=0) sum and the result lands lane-major, exactly how the output
  block wants it;
* the output is written channels-first ([B, C, K]) so the minor dim is the
  128-multiple query tile, not the tiny channel count; the caller
  transposes back (bandwidth-trivial next to the gather itself);
* a dot_general formulation (mask @ data on the MXU) pays the 128-lane
  output padding — with C=4 that is 32x wasted MXU work, and small
  contractions are exactly what made Mosaic spill in the NN kernel.

Selection by compare-and-sum is EXACT in f32: the sum has one nonzero
term, so no rounding occurs (only a -0.0 can normalise to +0.0).

The backward (scatter-add of the cotangent at idx) stays on the XLA path:
the only differentiating consumer is stage-2 set abstraction at
npoint=1 (K = nsample <= 32), far below kernel-worthy size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from interdiff_tpu.ops.pallas_nn import on_tpu

# Widest channel count routed to the kernel: the per-channel select+sum is
# unrolled, so compile time and VPU work grow linearly with C.  Stage-1
# grouping concats xyz(3) + <=5 point features; stage-2 (C~99) keeps XLA.
_MAX_C = 8


def _gather_kernel(idx_ref, data_ref, out_ref):
    """Blocks: idx (1, 1, TK) int32; data (1, N, C) f32; out (1, C, TK) f32.

    (idx carries a dummy middle axis so the block's last-two dims satisfy
    Mosaic's (8k, 128k)-or-full-dim tiling rule.)"""
    _, N, C = data_ref.shape
    TK = idx_ref.shape[2]
    idx = idx_ref[0]  # [1, TK]
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (N, TK), 0)
    mask = n_iota == idx  # [N, TK] — broadcast over sublanes
    for c in range(C):  # unrolled: 2D ops only
        col = data_ref[0, :, c : c + 1]  # [N, 1]
        out_ref[0, c, :] = jnp.sum(jnp.where(mask, col, 0.0), axis=0)


@functools.partial(jax.jit, static_argnames=("tile_k", "interpret"))
def gather_rows_pallas(data: jax.Array, idx: jax.Array, *,
                       tile_k: int = 512,
                       interpret: bool = False) -> jax.Array:
    """data: [B, N, C] f32, idx: [B, K] int in [0, N) -> [B, K, C].

    Exact equivalent of ``data[arange(B)[:, None], idx]``.  ``tile_k``
    must be a lane multiple (128) for the compiled path; VMEM per grid
    step is ~``N * tile_k * 4`` bytes for the mask tile plus the
    lane-padded data block (``N * 128 * 4``).
    """
    B, N, C = data.shape
    K = idx.shape[1]
    k_pad = (-K) % tile_k
    idx_p = jnp.pad(idx, ((0, 0), (0, k_pad))) if k_pad else idx
    Kp = K + k_pad
    out_t = pl.pallas_call(
        _gather_kernel,
        grid=(B, Kp // tile_k),
        in_specs=[
            pl.BlockSpec((1, 1, tile_k), lambda b, k: (b, 0, k),
                         memory_space=pltpu.VMEM),
            # same block for every k step -> fetched once per batch row
            pl.BlockSpec((1, N, C), lambda b, k: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, tile_k), lambda b, k: (b, 0, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Kp), jnp.float32),
        interpret=interpret,
    )(idx_p.astype(jnp.int32)[:, None, :], data.astype(jnp.float32))
    return jnp.swapaxes(out_t, 1, 2)[:, :K, :]


def _xla_gather_rows(data: jax.Array, idx: jax.Array) -> jax.Array:
    B = data.shape[0]
    return data[jnp.arange(B)[:, None], idx]


_FORCE_PALLAS_INTERPRET = False  # tests flip this to exercise the kernel off-TPU


@jax.custom_vjp
def gather_rows(data: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row-gather: data [B, N, C], idx [B, K] -> [B, K, C].

    Routes to the Pallas masked-reduction kernel on TPU when the channel
    count is kernel-sized (C <= 8) and data is f32; falls back to the XLA
    gather otherwise.  The VJP scatters the cotangent at ``idx`` on the
    XLA path either way (see module docstring).
    """
    return _gather_rows_fwd_impl(data, idx)


def _gather_rows_fwd_impl(data, idx):
    use_kernel = (data.shape[-1] <= _MAX_C and data.dtype == jnp.float32
                  and (on_tpu() or _FORCE_PALLAS_INTERPRET))
    if use_kernel:
        return gather_rows_pallas(data, idx,
                                  interpret=_FORCE_PALLAS_INTERPRET)
    return _xla_gather_rows(data, idx)


def _gather_rows_fwd(data, idx):
    # residuals must be JAX types: keep the row count as a python int and
    # recover the dtype from the cotangent (both paths preserve it — the
    # kernel is f32-only by the dispatch guard)
    return _gather_rows_fwd_impl(data, idx), (data.shape[1], idx)


def _gather_rows_bwd(res, g):
    n_rows, idx = res

    def scatter_one(ii, gg):
        return jnp.zeros((n_rows,) + gg.shape[1:], gg.dtype).at[ii].add(gg)

    g_data = jax.vmap(scatter_one)(idx, g)
    return g_data, np.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
