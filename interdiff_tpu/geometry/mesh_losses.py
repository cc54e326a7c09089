"""Mesh regularisation losses — contracts from `interdiff/tools.py:92-316`
(uniform/cot/cotcurv Laplacian smoothing, normal consistency, normal-vector
and edge-length losses).  Only `point2point_signed`/`rotvec_to_rotmat` sit
on InterDiff's live path, but these utilities are part of the reference's
geometry toolbox, so the rebuild ships them too — as pure-jnp dense ops
(meshes here are <= 6890 verts; a dense [V, V] uniform Laplacian is 190 MB —
instead we use segment-sum scatter forms that XLA fuses).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-16


def uniform_laplacian_smoothing(verts: jax.Array, faces: np.ndarray
                                ) -> jax.Array:
    """Per-vertex |L_u v| where L_u v[i] = mean_{j in N(i)} v_j - v_i
    (`tools.py:92-215`, method='uniform').  verts [..., V, 3]."""
    V = verts.shape[-2]
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [0, 2]]], axis=0)
    # undirected unique edges -> both directions
    e = np.unique(np.sort(edges, axis=1), axis=0)
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    deg = np.zeros(V, dtype=np.float32)
    np.add.at(deg, src, 1.0)
    deg = np.maximum(deg, 1.0)

    def one(v):
        acc = jnp.zeros_like(v).at[src].add(v[dst])
        lap = acc / deg[:, None] - v
        return jnp.linalg.norm(lap, axis=-1)

    batch = verts.reshape((-1, V, 3))
    return jax.vmap(one)(batch).reshape(verts.shape[:-1])


def _cotangents(verts: jax.Array, faces: np.ndarray) -> jax.Array:
    """Per-face cotangents of the three angles. verts [V,3] -> [F,3]
    (cot at vertex 0, 1, 2)."""
    tri = verts[faces]  # [F,3,3]
    a = tri[:, 1] - tri[:, 0]
    b = tri[:, 2] - tri[:, 0]
    c = tri[:, 2] - tri[:, 1]
    area2 = jnp.linalg.norm(jnp.cross(a, b), axis=-1) + 1e-12  # 2*area
    # cot at vertex k = dot of the two edges at k / (2 * area)
    cot0 = jnp.sum(a * b, axis=-1) / area2
    cot1 = jnp.sum(-a * c, axis=-1) / area2
    cot2 = jnp.sum(b * c, axis=-1) / area2
    return jnp.stack([cot0, cot1, cot2], axis=-1)


def cotcurv_laplacian_norm(verts: jax.Array, faces: np.ndarray) -> jax.Array:
    """Per-vertex curvature magnitude, the 'cotcurv' variant of
    `mesh_laplacian_smoothing` (`tools.py:196-215`):
    |(L v - (sum_j w_ij) v) * 1/(4 A_i)| with w_ij = cot a_ij + cot b_ij."""
    V = verts.shape[-2]

    def one(v):
        cots = _cotangents(v, faces)  # [F,3]
        tri_area = 0.5 * (jnp.linalg.norm(
            jnp.cross(v[faces[:, 1]] - v[faces[:, 0]],
                      v[faces[:, 2]] - v[faces[:, 0]]), axis=-1))
        # edge (1,2) is opposite vertex 0 etc.
        Lv = jnp.zeros_like(v)
        Wsum = jnp.zeros((V,))
        areas = jnp.zeros((V,))
        for k, (i, j) in enumerate(((1, 2), (0, 2), (0, 1))):
            w = cots[:, k]
            Lv = Lv.at[faces[:, i]].add(w[:, None] * v[faces[:, j]])
            Lv = Lv.at[faces[:, j]].add(w[:, None] * v[faces[:, i]])
            Wsum = Wsum.at[faces[:, i]].add(w)
            Wsum = Wsum.at[faces[:, j]].add(w)
        for k in range(3):
            areas = areas.at[faces[:, k]].add(tri_area)
        norm_w = 0.25 / jnp.maximum(areas, 1e-12)
        lap = (Lv - Wsum[:, None] * v) * norm_w[:, None]
        return jnp.linalg.norm(lap, axis=-1)

    batch = verts.reshape((-1, V, 3))
    return jax.vmap(one)(batch).reshape(verts.shape[:-1])


def laplacian_loss(verts: jax.Array, faces: np.ndarray) -> jax.Array:
    """`LaplacianLoss` (`tools.py:217-243`): mean cotcurv curvature."""
    return cotcurv_laplacian_norm(verts, faces).mean()


def normal_consistency_loss(verts: jax.Array, faces: np.ndarray) -> jax.Array:
    """`NormalConsistencyLoss` (`tools.py:245-260`): mean (1 - cos) between
    face normals across each shared edge (pytorch3d mesh_normal_consistency
    semantics)."""
    # build edge -> (face, face) adjacency on host
    edge_map = {}
    pairs = []
    for f, face in enumerate(np.asarray(faces)):
        for k in range(3):
            e = tuple(sorted((int(face[k]), int(face[(k + 1) % 3]))))
            if e in edge_map:
                pairs.append((edge_map[e], f))
            else:
                edge_map[e] = f
    if not pairs:
        return jnp.asarray(0.0)
    pairs = np.asarray(pairs)

    def one(v):
        tri = v[faces]
        n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        cos = jnp.sum(n[pairs[:, 0]] * n[pairs[:, 1]], axis=-1)
        return (1.0 - cos).mean()

    batch = verts.reshape((-1,) + verts.shape[-2:])
    return jax.vmap(one)(batch).mean()


def normal_vector_loss(coord_out: jax.Array, coord_gt: jax.Array,
                       faces: np.ndarray) -> jax.Array:
    """`NormalVectorLoss` (`tools.py:263-289`): |cos| between predicted edge
    directions and gt face normals, meaned."""
    def unit(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    v1o = unit(coord_out[:, f1] - coord_out[:, f0])
    v2o = unit(coord_out[:, f2] - coord_out[:, f0])
    v3o = unit(coord_out[:, f2] - coord_out[:, f1])
    v1g = unit(coord_gt[:, f1] - coord_gt[:, f0])
    v2g = unit(coord_gt[:, f2] - coord_gt[:, f0])
    n_g = unit(jnp.cross(v1g, v2g))
    cos = jnp.stack([jnp.abs(jnp.sum(v * n_g, -1))
                     for v in (v1o, v2o, v3o)], axis=1)
    return cos.mean()


def edge_length_loss(coord_out: jax.Array, coord_gt: jax.Array,
                     faces: np.ndarray, *, relative_length: bool = False
                     ) -> jax.Array:
    """`EdgeLengthLoss` (`tools.py:291-316`)."""
    def d(x, i, j):
        return jnp.sqrt(_EPS + jnp.sum(
            (x[:, faces[:, i]] - x[:, faces[:, j]]) ** 2, axis=-1))

    diffs = []
    for i, j in ((0, 1), (0, 2), (1, 2)):
        do, dg = d(coord_out, i, j), d(coord_gt, i, j)
        diff = jnp.abs(do - dg)
        if relative_length:
            diff = diff / dg
        diffs.append(diff)
    return jnp.stack(diffs, axis=1).mean()
