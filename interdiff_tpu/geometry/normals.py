"""Vertex normals by area-weighted face-normal accumulation (pure jnp).

Equivalent to the reference's scatter-add implementation
(`interdiff/data/tools.py:4-40`): for every face each corner accumulates the
cross product of its two outgoing edges, then normals are L2-normalised with
eps 1e-6 (``F.normalize`` clamps the denominator from below).

TPU note: the three corner contributions of a triangle are the *same*
vector in exact arithmetic — for corners (v0,v1,v2) with a=v1-v0, b=v2-v0,
the reference's e1=(v2-v1)x(v0-v1) and e2=(v0-v2)x(v1-v2) both reduce to
a x b.  So the accumulation is "each vertex sums the face normals of its
incident faces", and with a static face list it lowers to K dense gathers
over a precomputed [V, K] incidence table (K = max vertex degree) instead
of three scatter-adds — scatters serialise badly on TPU and dominated the
correction-in-scan profile.  The scatter formulation is kept as the
fallback for traced face arrays.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# faces-digest -> (num_verts, [V, K] int32 incident-face ids, padded with F)
# Bounded FIFO: synthetic fixtures generate fresh random face lists per rng,
# so an unbounded cache would grow monotonically across a test suite / long
# process with zero hit-rate benefit for those entries.
_INCIDENCE_CACHE: Dict[Tuple[str, int], np.ndarray] = {}
_INCIDENCE_CACHE_MAX = 8


def _face_incidence(faces: np.ndarray, num_verts: int) -> np.ndarray:
    """[V, K] ids of the faces incident to each vertex (pad value = F)."""
    key = (hashlib.sha1(faces.tobytes()).hexdigest(), num_verts)
    cached = _INCIDENCE_CACHE.get(key)
    if cached is not None:
        return cached
    F = faces.shape[0]
    flat = faces.reshape(-1).astype(np.int64)  # corner c of face f at 3f+c
    order = np.argsort(flat, kind="stable")
    sorted_v = flat[order]
    sorted_f = (order // 3).astype(np.int32)
    counts = np.bincount(flat, minlength=num_verts)
    K = int(counts.max()) if counts.size else 0
    starts = np.zeros(num_verts, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(flat.size, dtype=np.int64) - starts[sorted_v]
    incident = np.full((num_verts, max(K, 1)), F, dtype=np.int32)
    incident[sorted_v, pos] = sorted_f
    if len(_INCIDENCE_CACHE) >= _INCIDENCE_CACHE_MAX:
        _INCIDENCE_CACHE.pop(next(iter(_INCIDENCE_CACHE)))
    _INCIDENCE_CACHE[key] = incident
    return incident


def vertex_normals(vertices: jax.Array, faces) -> jax.Array:
    """Compute per-vertex normals.

    Args:
      vertices: [..., V, 3] float array.
      faces: [F, 3] int array (shared across the batch; the reference tiles
        the same face list per batch element).  A concrete (numpy or
        non-traced jax) array enables the fast gather path.

    Returns:
      [..., V, 3] unit normals.
    """
    batch_shape = vertices.shape[:-2]
    v = vertices.reshape((-1,) + vertices.shape[-2:])  # [B, V, 3]

    faces_np = None
    if isinstance(faces, np.ndarray):
        faces_np = faces
    elif isinstance(faces, jax.Array) and not isinstance(
            faces, jax.core.Tracer):
        faces_np = np.asarray(faces)

    if faces_np is not None:
        # Coordinate-planar row gathers: every `take` reads a dense
        # [3*B]-lane row per index instead of a 3-float sliver, the only
        # layout that moved the needle on v5e (corner gathers + cross at
        # B*T=800, V=6890, F=13776: 10.6 ms in [B,F,3] layout vs the whole
        # op at 11.3 ms here; K-loop/fused/segment-sum variants all ~14-17
        # ms, bit-identical outputs).  TPU dynamic gathers dominate this op
        # either way — the flops are negligible.
        incident = _face_incidence(faces_np, v.shape[-2])  # [V, K]
        B, V = v.shape[0], v.shape[-2]
        F, K = faces_np.shape[0], incident.shape[1]
        vr = v.transpose(1, 2, 0).reshape(V, 3 * B)  # coord-major rows
        c0 = jnp.take(vr, jnp.asarray(faces_np[:, 0]), axis=0)
        c1 = jnp.take(vr, jnp.asarray(faces_np[:, 1]), axis=0)
        c2 = jnp.take(vr, jnp.asarray(faces_np[:, 2]), axis=0)
        a = (c1 - c0).reshape(F, 3, B)
        b = (c2 - c0).reshape(F, 3, B)
        fn = jnp.stack([a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
                        a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
                        a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]],
                       axis=1).reshape(F, 3 * B)
        fn = jnp.concatenate([fn, jnp.zeros((1, 3 * B), fn.dtype)], axis=0)
        g = jnp.take(fn, jnp.asarray(incident.reshape(-1)), axis=0)
        n = g.reshape(V, K, 3, B).sum(1).transpose(2, 0, 1)  # [B, V, 3]
        norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
        out = n / jnp.maximum(norm, 1e-6)
        return out.reshape(batch_shape + vertices.shape[-2:])

    def one(verts):
        tri = verts[faces]  # [F, 3, 3]
        e0 = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        e1 = jnp.cross(tri[:, 2] - tri[:, 1], tri[:, 0] - tri[:, 1])
        e2 = jnp.cross(tri[:, 0] - tri[:, 2], tri[:, 1] - tri[:, 2])
        n = jnp.zeros_like(verts)
        n = n.at[faces[:, 0]].add(e0)
        n = n.at[faces[:, 1]].add(e1)
        n = n.at[faces[:, 2]].add(e2)
        norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
        return n / jnp.maximum(norm, 1e-6)

    out = jax.vmap(one)(v)
    return out.reshape(batch_shape + vertices.shape[-2:])
