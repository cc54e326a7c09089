"""Vertex normals by area-weighted face-normal accumulation (pure jnp).

Equivalent to the reference's scatter-add implementation
(`interdiff/data/tools.py:4-40`): for every face each corner accumulates the
cross product of its two outgoing edges, then normals are L2-normalised with
eps 1e-6 (``F.normalize`` clamps the denominator from below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vertex_normals(vertices: jax.Array, faces: jax.Array) -> jax.Array:
    """Compute per-vertex normals.

    Args:
      vertices: [..., V, 3] float array.
      faces: [F, 3] int array (shared across the batch; the reference tiles
        the same face list per batch element).

    Returns:
      [..., V, 3] unit normals.
    """
    batch_shape = vertices.shape[:-2]
    v = vertices.reshape((-1,) + vertices.shape[-2:])  # [B, V, 3]

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
