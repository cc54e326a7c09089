import numpy as np
import jax.numpy as jnp

from interdiff_tpu.geometry.dct import dct_matrices
from interdiff_tpu.geometry.normals import vertex_normals


def reference_dct(n):
    """Literal re-derivation of the reference's double loop
    (`interdiff/model/correction_smpl.py:55-67`)."""
    dct_m = np.eye(n)
    for k in np.arange(n):
        for i in np.arange(n):
            w = np.sqrt(2 / n)
            if k == 0:
                w = np.sqrt(1 / n)
            dct_m[k, i] = w * np.cos(np.pi * (i + 1 / 2) * k / n)
    return dct_m, np.linalg.inv(dct_m)


def test_dct_matches_reference_loop():
    for n in (20, 35):
        ours_d, ours_i = dct_matrices(n, dtype=np.float64)
        ref_d, ref_i = reference_dct(n)
        np.testing.assert_allclose(ours_d, ref_d, atol=1e-12)
        np.testing.assert_allclose(ours_i, ref_i, atol=1e-10)


def test_dct_orthonormal():
    d, i = dct_matrices(35, dtype=np.float64)
    np.testing.assert_allclose(d @ i, np.eye(35), atol=1e-10)


def test_dct_truncation_reconstruction():
    # keeping all coefficients reconstructs exactly; truncation low-passes
    n = 35
    d, i = dct_matrices(n, dtype=np.float64)
    x = np.sin(np.linspace(0, 3, n))
    np.testing.assert_allclose(i[:, :n] @ (d[:n] @ x), x, atol=1e-10)
    smooth = i[:, :10] @ (d[:10] @ x)
    assert np.abs(smooth - x).max() < 0.05  # smooth signal survives truncation


def _numpy_vertex_normals(vertices, faces):
    """Independent numpy re-derivation of area-weighted vertex normals."""
    out = np.zeros_like(vertices)
    for b in range(vertices.shape[0]):
        v = vertices[b]
        n = np.zeros_like(v)
        for f in faces:
            p0, p1, p2 = v[f[0]], v[f[1]], v[f[2]]
            fn = np.cross(p1 - p0, p2 - p0)
            n[f[0]] += fn
            n[f[1]] += fn
            n[f[2]] += fn
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        out[b] = n / np.maximum(norm, 1e-6)
    return out


def test_vertex_normals_match_numpy(rng):
    verts = rng.normal(size=(2, 30, 3)).astype(np.float32)
    # random triangulation over the 30 vertices
    faces = rng.integers(0, 30, size=(40, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    ours = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    ref = _numpy_vertex_normals(verts, faces)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_vertex_normals_unit_sphere():
    # icosahedron-ish: vertices on a sphere, normals point outward
    golden = (1 + 5**0.5) / 2
    verts = np.array([
        [-1, golden, 0], [1, golden, 0], [-1, -golden, 0], [1, -golden, 0],
        [0, -1, golden], [0, 1, golden], [0, -1, -golden], [0, 1, -golden],
        [golden, 0, -1], [golden, 0, 1], [-golden, 0, -1], [-golden, 0, 1],
    ], dtype=np.float32)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ])
    n = np.asarray(vertex_normals(jnp.asarray(verts[None]), jnp.asarray(faces)))[0]
    cos = (n * verts).sum(axis=1)
    assert (cos > 0.99).all()
