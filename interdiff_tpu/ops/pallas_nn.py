"""Pallas TPU kernel for brute-force nearest-neighbour queries — the hot op
behind `point2point_signed` (6890 SMPL verts x 2048 object points per frame,
batched over T*B; SURVEY.md §2.2 'chamfer_distance').

Formulation: for the argmin over b of |a-b|^2 the |a|^2 term is constant per
query row, so the kernel computes ``min_j (|b_j|^2 - 2 a.b_j)`` and adds
|a|^2 back at the end.  The [TILE_A, M] score tile never leaves VMEM.

Lowering notes (v5e, measured via scripts/pallas_tpu_attempt.py):

* expressing ``a.b`` as a batched dot_general with a size-3 contraction
  makes Mosaic spill catastrophically — the register allocator asked for
  128.75 MB of scoped VMEM spill slots even for an 8x128x256 grid ("Ran
  out of memory in memory space vmem").  A contraction of 3 has no
  business on the MXU anyway; the kernel instead broadcasts the three
  coordinate planes as [TA,1]x[1,M] FMAs on the VPU:
      scores = |b|^2 - 2*(a_x b_x + a_y b_y + a_z b_z)
  with b passed pre-transposed [3, M] so every intermediate is 2D-tiled;
* output blocks must be (8k, 128k)-tiled, so the grid processes 8 batch
  rows x TILE_A queries per step, with an unrolled 8-row loop of 2D ops
  inside the kernel (3D broadcasts are avoided).

Per grid step VMEM ~ TA*M*4B transient per row (1 MB at 128x2048).
Falls back to the chunked XLA path on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BB = 8  # batch rows per block (sublane tiling requirement on outputs)


def _row_dots(a, xt):
    """[TA, 3] x [3, M] -> [TA, M] as three [TA,1]x[1,M] VPU FMAs (a size-3
    dot_general contraction makes Mosaic spill catastrophically — see the
    module docstring)."""
    acc = a[:, 0:1] * xt[0:1, :]
    acc = acc + a[:, 1:2] * xt[1:2, :]
    return acc + a[:, 2:3] * xt[2:3, :]


def _row_scores(a, bt):
    """Per-candidate ``|b_j|^2 - 2 a.b_j`` (argmin-equivalent to the squared
    distance; the |a|^2 constant is added back outside the kernel)."""
    b2 = jnp.sum(bt * bt, axis=0, keepdims=True)  # [1, M]
    return b2 - 2.0 * _row_dots(a, bt)


def _nn_kernel(a_ref, bt_ref, dist_ref, idx_ref):
    for r in range(_BB):  # unrolled: 2D ops only, no 3D broadcasts
        scores = _row_scores(a_ref[r], bt_ref[r])  # [TA, M]
        dist_ref[r] = jnp.min(scores, axis=-1)
        idx_ref[r] = jnp.argmin(scores, axis=-1).astype(jnp.int32)


def _run_nn_kernel(kernel, a, surfaces, *, n_extra_f32_outs, tile_a,
                   interpret):
    """Shared pallas_call scaffolding for the NN-sweep kernels: pad the
    queries to (_BB, tile_a) block multiples, pre-transpose every [B, M, 3]
    surface input to [Bp, 3, M] (so all kernel intermediates are 2D-tiled),
    launch over a (batch-blocks, query-tiles) grid, then slice the padding
    off and convert the partial scores back to clamped squared distances.

    ``kernel`` must write ``dist_ref`` first, then ``n_extra_f32_outs``
    float32 per-query outputs, then an int32 ``idx_ref``.  Returns
    ``(sq_dist, *extras, idx)``, each [B, N]."""
    B, N, _ = a.shape
    M = surfaces[0].shape[1]
    b_pad = (-B) % _BB
    n_pad = (-N) % tile_a
    if b_pad or n_pad:
        a_padded = jnp.pad(a, ((0, b_pad), (0, n_pad), (0, 0)))
    else:
        a_padded = a
    ts = [jnp.swapaxes(jnp.pad(s, ((0, b_pad), (0, 0), (0, 0)))
                       if b_pad else s, 1, 2) for s in surfaces]
    Bp, Np = B + b_pad, N + n_pad

    n_outs = 2 + n_extra_f32_outs  # dist + extras + idx
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // _BB, Np // tile_a),
        in_specs=[pl.BlockSpec((_BB, tile_a, 3), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((_BB, 3, M), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)] * len(ts),
        out_specs=[pl.BlockSpec((_BB, tile_a), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)] * n_outs,
        out_shape=[jax.ShapeDtypeStruct((Bp, Np), jnp.float32)]
        * (n_outs - 1) + [jax.ShapeDtypeStruct((Bp, Np), jnp.int32)],
        interpret=interpret,
    )(a_padded, *ts)

    a2 = jnp.sum(a * a, axis=-1)
    dist = jnp.maximum(outs[0][:B, :N] + a2, 0.0)
    return (dist,) + tuple(o[:B, :N] for o in outs[1:])


@functools.partial(jax.jit, static_argnames=("tile_a", "interpret"))
def nearest_neighbor_pallas(a: jax.Array, b: jax.Array, *,
                            tile_a: int = 128,
                            interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """a: [B, N, 3], b: [B, M, 3] -> (sq_dist [B, N], idx [B, N] int32)."""
    dist, idx = _run_nn_kernel(_nn_kernel, a, [b], n_extra_f32_outs=0,
                               tile_a=tile_a, interpret=interpret)
    return dist, idx


def _signed_nn_kernel(a_ref, bt_ref, nt_ref, dist_ref, sdot_ref, idx_ref):
    """NN + pseudonormal dot at the argmin, fused.

    For each query a: j* = argmin_j |a - b_j|^2 and
    sdot = n_{j*} . (a - b_{j*}).  Computing sdot in-kernel removes the
    two [batch, N, 3] take_along_axis gathers the eval path otherwise
    needs (measured 70 ms at 800x2048-from-6890 on v5e — more than the NN
    itself); the sign of sdot is the inside/outside test of
    `point2point_signed` and |a - b_{j*}| is just sqrt(dist).  j* is also
    emitted so the custom VJP can route gradients without re-running the
    sweep."""
    for r in range(_BB):  # unrolled: 2D ops only (see _nn_kernel notes)
        a = a_ref[r]  # [TA, 3]
        bt = bt_ref[r]  # [3, M]
        nt = nt_ref[r]  # [3, M]
        scores = _row_scores(a, bt)  # [TA, M]
        nb = jnp.sum(nt * bt, axis=0, keepdims=True)  # [1, M]
        s = _row_dots(a, nt) - nb  # n_j . (a - b_j) per candidate
        amin = jnp.argmin(scores, axis=-1).astype(jnp.int32)  # [TA]
        iota = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        dist_ref[r] = jnp.min(scores, axis=-1)
        idx_ref[r] = amin
        # first-occurrence argmin selection == take_along_axis semantics
        sdot_ref[r] = jnp.sum(
            jnp.where(iota == amin[:, None], s, 0.0), axis=-1)


@functools.partial(jax.jit, static_argnames=("tile_a", "interpret"))
def signed_nearest_pallas(a: jax.Array, b: jax.Array, n: jax.Array, *,
                          tile_a: int = 128,
                          interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """a: [B, N, 3] queries, b: [B, M, 3] surface points, n: [B, M, 3]
    (pseudo)normals -> (sq_dist [B, N], sdot [B, N], idx [B, N] int32) with
    ``sdot = n[idx] . (a - b[idx])`` (sign < 0 means inside)."""
    dist, sdot, idx = _run_nn_kernel(_signed_nn_kernel, a, [b, n],
                                     n_extra_f32_outs=1, tile_a=tile_a,
                                     interpret=interpret)
    return dist, sdot, idx


_FORCE_INTERPRET = False  # tests flip this to exercise the VJP off-TPU

# ---------------------------------------------------------------------------
# Pruned signed-NN sweep: segment the surface axis, skip far segments.
#
# The full-size correction gate's object->body sweep (800 x 2048 x 6890)
# runs AT the VPU roof (round-4 decomposition: 65.6 of 81.5 ms), so the
# remaining factor is algorithmic: most body vertices can never be the
# nearest neighbour of any object point — the object is compact, so verts
# far from the object's AABB are provably irrelevant.  The surface axis is
# cut into SEG-sized segments; a per-(frame, segment) flag says whether ANY
# vert of the segment lies within ``delta`` of the query cloud's AABB
# (box distance, computed in XLA — O(M) per frame).  The kernel walks
# segments on the innermost grid axis with the running (min, argmin, sdot)
# accumulated in the revisited output blocks, and `pl.when(flag)` skips the
# VPU work of far segments entirely (their block DMA still streams — 48 KB
# per skipped step, bandwidth-trivial next to the saved FMAs).
#
# EXACTNESS CONTRACT (callers rely on this — `eval/smpl_short.py` gate):
# for every query q, if the TRUE nearest-vert distance d(q) < delta then
# the pruned result is BIT-EQUAL to the full sweep (same per-pair
# arithmetic, same first-occurrence argmin: a true NN vert within delta of
# q, which lies inside the query AABB, has box-distance < delta, so its
# segment is flagged and swept).  Otherwise the wrapper returns exactly
# (delta^2, +1.0): d_pruned >= delta implies d(q) >= delta, and with
# delta >= the body's maximum interior-point-to-nearest-vertex distance
# (~0.17 m for SMPL-scale meshes; default 0.25) such a point is provably
# OUTSIDE the body, so its penetration contribution is zero under either
# path.  Queries are NOT differentiable through this op (the gate is a
# sampling-time test); training keeps the full kernel.
# ---------------------------------------------------------------------------

_SEG_INF = 3.0e38  # running-min init; beats every real |b|^2-2ab score


def _make_seg_signed_kernel(n_seg: int, seg: int):
    def kernel(flag_ref, a_ref, bt_ref, nt_ref, dist_ref, sdot_ref,
               idx_ref):
        # flag_ref holds the FULL [n_blocks, n_seg] flag table in SMEM
        # (Mosaic requires SMEM blocks to equal the array dims — a (1, 1)
        # windowed spec fails lowering; observed on-chip 2026-08-20).
        #
        # The segment walk happens INSIDE the kernel over the resident
        # [_BB, 3, Mp] surface block — the first formulation put segments
        # on a third grid axis with revisited accumulator outputs, and the
        # 14x grid-step count made the kernel 4x SLOWER per unit work
        # (258 vs 65 ms at 72% flags, chip 2026-08-20).  Here the grid is
        # IDENTICAL to the full kernel's; a skipped segment skips its VPU
        # work via a scalar-core branch and everything else stays resident.
        # The output refs double as the running (min, sdot, idx)
        # accumulators (pl.when regions cannot return values, only write
        # refs); strict < on the merge keeps the first-occurrence argmin.
        i = pl.program_id(0)
        dist_ref[...] = jnp.full(dist_ref.shape, _SEG_INF, jnp.float32)
        sdot_ref[...] = jnp.ones(sdot_ref.shape, jnp.float32)
        idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)

        for g in range(n_seg):
            @pl.when(flag_ref[i, g] != 0)
            def _(g=g):
                base = g * seg
                for r in range(_BB):  # unrolled: 2D ops only
                    a = a_ref[r]  # [TA, 3]
                    bt = bt_ref[r, :, base:base + seg]  # [3, SEG] static
                    nt = nt_ref[r, :, base:base + seg]
                    scores = _row_scores(a, bt)  # [TA, SEG]
                    nb = jnp.sum(nt * bt, axis=0, keepdims=True)
                    s = _row_dots(a, nt) - nb
                    amin = jnp.argmin(scores, axis=-1).astype(jnp.int32)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, scores.shape, 1)
                    loc_min = jnp.min(scores, axis=-1)
                    loc_sdot = jnp.sum(
                        jnp.where(iota == amin[:, None], s, 0.0), axis=-1)
                    better = loc_min < dist_ref[r]
                    dist_ref[r] = jnp.where(better, loc_min, dist_ref[r])
                    sdot_ref[r] = jnp.where(better, loc_sdot, sdot_ref[r])
                    idx_ref[r] = jnp.where(better, amin + base, idx_ref[r])

    return kernel


def _make_seg_signed_kernel_fori(n_seg: int, seg: int):
    """fori_loop segment walk over [_BB, n_seg, 3, seg]-reshaped surface
    blocks (dynamic LEADING-dim ref indexing, which Mosaic lowers without
    relayout) — one loop body instead of n_seg unrolled when-regions, so
    kernel code size matches the full kernel's instead of growing 14x.
    Numerics are identical to the unrolled walk: same per-segment
    arithmetic, same strict-< merge order."""

    def kernel(flag_ref, a_ref, b4_ref, n4_ref, dist_ref, sdot_ref,
               idx_ref):
        i = pl.program_id(0)
        dist_ref[...] = jnp.full(dist_ref.shape, _SEG_INF, jnp.float32)
        sdot_ref[...] = jnp.ones(sdot_ref.shape, jnp.float32)
        idx_ref[...] = jnp.zeros(idx_ref.shape, jnp.int32)

        def body(g, carry):
            @pl.when(flag_ref[i, g] != 0)
            def _():
                base = g * seg
                for r in range(_BB):  # unrolled: 2D ops only
                    a = a_ref[r]  # [TA, 3]
                    bt = b4_ref[r, g]  # [3, SEG] dynamic leading index
                    nt = n4_ref[r, g]
                    scores = _row_scores(a, bt)  # [TA, SEG]
                    nb = jnp.sum(nt * bt, axis=0, keepdims=True)
                    s = _row_dots(a, nt) - nb
                    amin = jnp.argmin(scores, axis=-1).astype(jnp.int32)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, scores.shape, 1)
                    loc_min = jnp.min(scores, axis=-1)
                    loc_sdot = jnp.sum(
                        jnp.where(iota == amin[:, None], s, 0.0), axis=-1)
                    better = loc_min < dist_ref[r]
                    dist_ref[r] = jnp.where(better, loc_min, dist_ref[r])
                    sdot_ref[r] = jnp.where(better, loc_sdot, sdot_ref[r])
                    idx_ref[r] = jnp.where(better, amin + base, idx_ref[r])

            return carry

        jax.lax.fori_loop(0, n_seg, body, 0)

    return kernel


def _make_seg_signed_kernel_lanefold(n_seg: int, seg: int, tile_a: int):
    """Lane-folded running argmin: the chip A/B showed per-segment
    cross-lane reductions cost ~1-1.5 us per (segment, row) visit — at 14
    segments that drowns the skipped FMAs (fori:512 = 256 ms vs 65 full).
    This formulation keeps the per-segment work PURELY elementwise: a
    [TA, seg] accumulator triple (score, sdot, winning segment#) is updated
    with strict-< selects, and ONE final cross-lane pass per row recovers
    the global result — so the reduction cost matches the full kernel's
    instead of scaling with segment count.

    Tie semantics: lane l of the accumulator holds the best candidate
    among global indices {g*seg + l}, keeping the LARGEST g on score ties
    (<=); the final pass takes the min score m (f32 min is order-
    independent -> bit-equal to the full sweep) and among lanes tied at m
    picks the LARGEST stored global index.  This mirrors the on-chip
    behaviour of the full kernel's jnp.argmin, which Mosaic lowers with
    LAST-occurrence tie-breaking (measured 2026-08-20: exact score ties at
    [8,1652] idx 538/593 and [33,1659] idx 31/52 — the full kernel picked
    the larger index both times, and the fori/unrolled variants matched it
    via their per-segment jnp.argmin; a min-index tie-break here failed
    the bit-equality contract on exactly those queries).  NOTE interpret
    mode (XLA argmin = FIRST occurrence) therefore disagrees with this
    variant on exact ties — chip-vs-chip is the contract that matters.
    acc_ix values are unique per lane (lane l only holds indices ≡ l mod
    seg), so the sdot select matches exactly one position."""

    def kernel(flag_ref, a_ref, b4_ref, n4_ref, dist_ref, sdot_ref,
               idx_ref, asc_ref, asd_ref, agx_ref):
        i = pl.program_id(0)
        for r in range(_BB):  # unrolled: 2D ops only
            asc_ref[...] = jnp.full((tile_a, seg), _SEG_INF, jnp.float32)
            asd_ref[...] = jnp.zeros((tile_a, seg), jnp.float32)
            agx_ref[...] = jnp.zeros((tile_a, seg), jnp.int32)
            a = a_ref[r]  # [TA, 3]

            def body(g, carry):
                @pl.when(flag_ref[i, g] != 0)
                def _():
                    bt = b4_ref[r, g]  # [3, SEG] dynamic leading index
                    nt = n4_ref[r, g]
                    scores = _row_scores(a, bt)  # [TA, SEG]
                    nb = jnp.sum(nt * bt, axis=0, keepdims=True)
                    s = _row_dots(a, nt) - nb
                    better = scores <= asc_ref[...]
                    asc_ref[...] = jnp.where(better, scores, asc_ref[...])
                    asd_ref[...] = jnp.where(better, s, asd_ref[...])
                    agx_ref[...] = jnp.where(better, g, agx_ref[...])

                return carry

            jax.lax.fori_loop(0, n_seg, body, 0)
            acc = asc_ref[...]
            m = jnp.min(acc, axis=-1)  # bit-equal to the full-width min
            gix = agx_ref[...] * seg + jax.lax.broadcasted_iota(
                jnp.int32, (tile_a, seg), 1)
            tie = acc == m[:, None]
            ix = jnp.max(jnp.where(tie, gix, jnp.int32(-1)), axis=-1)
            pick = tie & (gix == ix[:, None])
            dist_ref[r] = m
            idx_ref[r] = ix
            sdot_ref[r] = jnp.sum(jnp.where(pick, asd_ref[...], 0.0),
                                  axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnames=("delta", "seg", "tile_a",
                                             "interpret", "variant"))
def signed_nearest_pruned_pallas(a: jax.Array, b: jax.Array, n: jax.Array,
                                 *, delta: float = 0.25,
                                 seg: int | None = None,
                                 tile_a: int = 128,
                                 interpret: bool = False,
                                 variant: str = "fori"
                                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Segment-pruned fused signed-NN (see the contract block above).

    a: [B, N, 3] queries, b: [B, M, 3] surface verts, n: [B, M, 3]
    pseudonormals -> (sq_dist, sdot, idx), each [B, N]; results bit-equal
    to :func:`signed_nearest_pallas` wherever true distance < ``delta``,
    exactly ``(delta**2, +1.0, 0)`` beyond.

    ``seg=None`` -> ceil(M/4) rounded up to a 128 multiple: the chip
    sweep showed per-(segment, row) VISIT overhead (~0.4-1.1 us — the
    cross-lane min/argmin/select-sum reductions per segment) dwarfs the
    saved FMAs when segments are narrow (fori:512 = 256 ms vs full 65 at
    near-full flags; fori:2048 = 99), so FEW segments win: 4 segments
    keeps worst-case overhead ~1.3x while far-object geometry still
    measures 4.6x faster (14.31 ms).  seg MUST be a multiple of 128: the
    per-segment jnp.argmin + ordered strict-< merge then reproduces the
    full-width Mosaic argmin's fold order EXACTLY, ties included (Mosaic
    folds vregs sequentially preferring the earlier vreg, with a separate
    intra-vreg tree rule — measured via exact Fibonacci-lattice score
    ties: full argmin picked the larger index within a vreg at [8,1652]
    but the smaller-vreg index at [132,376]); a lane-misaligned seg would
    break that correspondence."""
    B, N, _ = a.shape
    M = b.shape[1]
    if seg is None:
        quarter = -(-M // 4)  # ceil(M/4)
        seg = max(512, -(-quarter // 128) * 128)  # round up to lane tiles
    m_pad = (-M) % seg
    if m_pad:
        # far sentinel verts never win the min and never flag a segment
        b = jnp.pad(b, ((0, 0), (0, m_pad), (0, 0)), constant_values=1e6)
        n = jnp.pad(n, ((0, 0), (0, m_pad), (0, 0)))
    Mp = M + m_pad
    n_seg = Mp // seg

    # per-(frame, segment) flags from the vert-to-query-AABB box distance
    qlo = jnp.min(a, axis=1)  # [B, 3]
    qhi = jnp.max(a, axis=1)
    excess = jnp.maximum(jnp.maximum(qlo[:, None, :] - b,
                                     b - qhi[:, None, :]), 0.0)
    boxd2 = jnp.sum(excess * excess, axis=-1)  # [B, Mp]
    seg_min = jnp.min(boxd2.reshape(B, n_seg, seg), axis=-1)
    frame_flags = seg_min < delta * delta  # [B, n_seg]

    b_pad = (-B) % _BB
    n_pad = (-N) % tile_a
    a_p = jnp.pad(a, ((0, b_pad), (0, n_pad), (0, 0))) \
        if (b_pad or n_pad) else a
    bt = jnp.swapaxes(jnp.pad(b, ((0, b_pad), (0, 0), (0, 0)))
                      if b_pad else b, 1, 2)
    nt = jnp.swapaxes(jnp.pad(n, ((0, b_pad), (0, 0), (0, 0)))
                      if b_pad else n, 1, 2)
    Bp, Np = B + b_pad, N + n_pad
    # one flag per 8-row batch block: sweep the segment if ANY row needs it
    # (padding rows never flag)
    ff = jnp.pad(frame_flags, ((0, b_pad), (0, 0))) if b_pad \
        else frame_flags
    block_flags = jnp.max(ff.reshape(Bp // _BB, _BB, n_seg),
                          axis=1).astype(jnp.int32)

    scratch_shapes = []
    if variant in ("fori", "lanefold"):
        # [Bp, 3, Mp] -> [Bp, n_seg, 3, seg]: dynamic-leading-dim reads
        bt = jnp.swapaxes(bt.reshape(Bp, 3, n_seg, seg), 1, 2)
        nt = jnp.swapaxes(nt.reshape(Bp, 3, n_seg, seg), 1, 2)
        surf_spec = pl.BlockSpec((_BB, n_seg, 3, seg),
                                 lambda i, j: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        if variant == "fori":
            kernel = _make_seg_signed_kernel_fori(n_seg, seg)
        else:
            kernel = _make_seg_signed_kernel_lanefold(n_seg, seg, tile_a)
            scratch_shapes = [pltpu.VMEM((tile_a, seg), jnp.float32),
                              pltpu.VMEM((tile_a, seg), jnp.float32),
                              pltpu.VMEM((tile_a, seg), jnp.int32)]
    elif variant == "unrolled":
        kernel = _make_seg_signed_kernel(n_seg, seg)
        surf_spec = pl.BlockSpec((_BB, 3, Mp), lambda i, j: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        raise ValueError(f"unknown pruned-NN variant: {variant!r}")

    dist, sdot, idx = pl.pallas_call(
        kernel,
        scratch_shapes=scratch_shapes,
        grid=(Bp // _BB, Np // tile_a),
        in_specs=[
            pl.BlockSpec(block_flags.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_BB, tile_a, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            surf_spec,
            surf_spec,
        ],
        out_specs=[pl.BlockSpec((_BB, tile_a), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((Bp, Np), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((Bp, Np), jnp.int32)],
        interpret=interpret,
    )(block_flags, a_p, bt, nt)

    a2 = jnp.sum(a * a, axis=-1)
    sq = jnp.maximum(dist[:B, :N] + a2, 0.0)
    sdot = sdot[:B, :N]
    idx = idx[:B, :N]
    d2 = jnp.float32(delta) * jnp.float32(delta)
    # beyond-delta queries (incl. rows whose every segment was skipped —
    # running min still _SEG_INF) get the forced (delta^2, +1, 0) triple
    far = sq >= d2
    return (jnp.where(far, d2, sq), jnp.where(far, 1.0, sdot),
            jnp.where(far, 0, idx))


@jax.custom_vjp
def nearest_neighbor_pallas_diff(a: jax.Array, b: jax.Array
                                 ) -> Tuple[jax.Array, jax.Array]:
    """Differentiable wrapper around the Pallas NN kernel.

    Pallas calls don't support reverse-mode autodiff, but the true gradient
    is simple: ``sq_dist = |a - b[idx]|^2`` with ``idx`` piecewise-constant,
    so d/da = 2(a - b[idx]) and d/db scatters the negation at idx.  Needed
    by every consumer that differentiates through `point2point_signed`
    (correction training, post-hoc optimization)."""
    return nearest_neighbor_pallas(a, b, interpret=_FORCE_INTERPRET)


def _nn_diff_fwd(a, b):
    d, i = nearest_neighbor_pallas(a, b, interpret=_FORCE_INTERPRET)
    return (d, i), (a, b, i)


def _nn_diff_bwd(res, cotangents):
    from interdiff_tpu.ops.signed_distance import _gather

    a, b, i = res
    gd, _ = cotangents  # integer idx output carries no gradient
    ga = 2.0 * gd[..., None] * (a - _gather(b, i))

    def scatter_one(bb, ii, gg):
        return jnp.zeros_like(bb).at[ii].add(gg)

    gb = jax.vmap(scatter_one)(b, i, -ga)
    return ga, gb


nearest_neighbor_pallas_diff.defvjp(_nn_diff_fwd, _nn_diff_bwd)


@jax.custom_vjp
def signed_nearest_pallas_diff(a: jax.Array, b: jax.Array, n: jax.Array
                               ) -> Tuple[jax.Array, jax.Array]:
    """Differentiable wrapper around the fused signed-NN kernel.

    With ``j* = argmin_j |a - b_j|^2`` piecewise-constant the primals are
    ``sq = |a - b[j*]|^2`` and ``sdot = n[j*] . (a - b[j*])``, so

        d sq/da = 2 (a - b[j*])        d sq/db[j*]  = -2 (a - b[j*])
        d sdot/da = n[j*]              d sdot/db[j*] = -n[j*]
        d sdot/dn[j*] = a - b[j*]

    Needed by the differentiated consumers of `point2point_signed`
    (correction training penetration term, post-hoc optimization)."""
    d, s, _ = signed_nearest_pallas(a, b, n, interpret=_FORCE_INTERPRET)
    return d, s


def _snn_diff_fwd(a, b, n):
    d, s, i = signed_nearest_pallas(a, b, n, interpret=_FORCE_INTERPRET)
    return (d, s), (a, b, n, i)


def _snn_diff_bwd(res, cotangents):
    from interdiff_tpu.ops.signed_distance import _gather

    a, b, n, i = res
    gd, gs = cotangents
    n_near = _gather(n, i)
    diff = a - _gather(b, i)
    ga = 2.0 * gd[..., None] * diff + gs[..., None] * n_near
    gb_rows = -2.0 * gd[..., None] * diff - gs[..., None] * n_near
    gn_rows = gs[..., None] * diff

    def scatter_one(buf, ii, gg):
        return jnp.zeros_like(buf).at[ii].add(gg)

    gb = jax.vmap(scatter_one)(b, i, gb_rows)
    gn = jax.vmap(scatter_one)(n, i, gn_rows)
    return ga, gb, gn


signed_nearest_pallas_diff.defvjp(_snn_diff_fwd, _snn_diff_bwd)


def on_tpu() -> bool:
    """True on a TPU backend (the axon tunnel also reports platform 'tpu'
    and lowers this kernel fine — measured 0.8-2s Mosaic compiles and
    3.9-12.9x speedup over the chunked-XLA path, scripts/
    pallas_tpu_attempt.py).  The round-1 'Mosaic stalls over the tunnel'
    lore traced to the old dot_general formulation's VMEM OOM, not to the
    tunnel."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
