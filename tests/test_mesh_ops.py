"""Mesh I/O + signed-distance-to-mesh tests (igl / trimesh / psbody
replacements; `interdiff/data/prepare_behave.py` contract)."""

import numpy as np
import pytest

from interdiff_tpu.data.mesh_io import Mesh, load_obj, load_ply, sample_surface
from interdiff_tpu.ops.mesh_distance import signed_distance_to_mesh


def _unit_cube():
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 dtype=np.float64)
    # 12 triangles, outward-facing
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # x=0 face (normal -x)
        [4, 6, 7], [4, 7, 5],  # x=1 face (+x)
        [0, 4, 5], [0, 5, 1],  # y=0 (-y)
        [2, 3, 7], [2, 7, 6],  # y=1 (+y)
        [0, 2, 6], [0, 6, 4],  # z=0 (-z)
        [1, 5, 7], [1, 7, 3],  # z=1 (+z)
    ], dtype=np.int32)
    return Mesh(v, f)


def test_signed_distance_cube():
    mesh = _unit_cube()
    pts = np.array([
        [0.5, 0.5, 0.5],   # center: inside, dist -0.5
        [0.5, 0.5, 1.5],   # above top: +0.5
        [-0.25, 0.5, 0.5],  # left of x=0 face: +0.25
        [0.5, 0.5, 0.9],   # inside near top: -0.1
        [2.0, 2.0, 2.0],   # outside near corner (1,1,1): sqrt(3)
    ])
    d, fidx, cp = signed_distance_to_mesh(pts, mesh.vertices, mesh.faces,
                                          face_chunk=5)
    np.testing.assert_allclose(d, [-0.5, 0.5, 0.25, -0.1, np.sqrt(3)],
                               atol=1e-5)


def test_obj_roundtrip(tmp_path):
    mesh = _unit_cube()
    p = tmp_path / "cube.obj"
    with open(p, "w") as f:
        for v in mesh.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in mesh.faces:
            f.write(f"f {face[0]+1} {face[1]+1} {face[2]+1}\n")
    loaded = load_obj(p)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)


def test_ply_ascii(tmp_path):
    mesh = _unit_cube()
    p = tmp_path / "cube.ply"
    with open(p, "wb") as f:
        header = ("ply\nformat ascii 1.0\n"
                  f"element vertex {len(mesh.vertices)}\n"
                  "property float x\nproperty float y\nproperty float z\n"
                  f"element face {len(mesh.faces)}\n"
                  "property list uchar int vertex_indices\nend_header\n")
        f.write(header.encode())
        for v in mesh.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n".encode())
        for face in mesh.faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n".encode())
    loaded = load_ply(p)
    np.testing.assert_allclose(loaded.vertices, mesh.vertices)
    np.testing.assert_array_equal(loaded.faces, mesh.faces)


def test_sample_surface_on_mesh():
    mesh = _unit_cube()
    pts, fidx = sample_surface(mesh, 256, rng=np.random.default_rng(0))
    assert pts.shape == (256, 3)
    # every sample lies on the cube surface: one coordinate is 0 or 1
    on_face = np.isclose(pts, 0).any(axis=1) | np.isclose(pts, 1).any(axis=1)
    assert on_face.all()
    # face areas are uniform -> roughly uniform face histogram
    assert len(np.unique(fidx)) >= 10


def test_contact_labels_for_frame():
    from interdiff_tpu.data.prepare_behave import contact_labels_for_frame

    mesh = _unit_cube()
    pts = np.array([[0.5, 0.5, 1.01],   # 0.01 above: contact (<0.02)
                    [0.5, 0.5, 2.0]])   # far: no contact
    ol, hl = contact_labels_for_frame(pts, mesh.vertices, mesh.faces,
                                      thres=0.02)
    assert list(ol) == [0]
    assert len(hl) == 0  # nearest cube corner is ~0.7 from the point
