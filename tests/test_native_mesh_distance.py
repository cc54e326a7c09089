"""Native C++ BVH signed distance vs the JAX implementation and analytic
cases (igl replacement, `native/mesh_distance.cpp`)."""

import numpy as np
import pytest

from interdiff_tpu.utils.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib not built (no g++?)")


def _icosphere(rng, n_subdiv=24):
    """Random convex-ish blob: unit sphere point cloud triangulated by hull
    is overkill; use a UV sphere mesh."""
    import numpy as np

    nu, nv = n_subdiv, n_subdiv
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(1e-3, np.pi - 1e-3, nv)
    verts = []
    for v in vs:
        for u in us:
            verts.append([np.sin(v) * np.cos(u), np.cos(v),
                          np.sin(v) * np.sin(u)])
    verts = np.asarray(verts, dtype=np.float32)
    faces = []
    for i in range(nv - 1):
        for j in range(nu):
            a = i * nu + j
            b = i * nu + (j + 1) % nu
            c = (i + 1) * nu + j
            d = (i + 1) * nu + (j + 1) % nu
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts, np.asarray(faces, dtype=np.int32)


def test_native_matches_jax(rng):
    from interdiff_tpu.ops.mesh_distance import signed_distance_to_mesh
    from interdiff_tpu.utils.native import SignedDistanceMesh

    verts, faces = _icosphere(rng)
    pts = rng.standard_normal((64, 3)).astype(np.float32) * 1.2
    d_native, f_native, _ = SignedDistanceMesh(verts, faces).query(pts)
    d_jax, _, _ = signed_distance_to_mesh(pts, verts, faces)
    np.testing.assert_allclose(d_native, np.asarray(d_jax), atol=2e-4)


def test_native_sphere_sign(rng):
    from interdiff_tpu.utils.native import SignedDistanceMesh

    verts, faces = _icosphere(rng, n_subdiv=32)
    m = SignedDistanceMesh(verts, faces)
    inside = np.zeros((1, 3), dtype=np.float32)
    outside = np.array([[0, 0, 2.0]], dtype=np.float32)
    d_in, _, _ = m.query(inside)
    d_out, _, _ = m.query(outside)
    assert d_in[0] < 0 and abs(abs(d_in[0]) - 1.0) < 0.05
    assert d_out[0] > 0 and abs(d_out[0] - 1.0) < 0.05
